"""Multi-scale mask decoder (PixelLM variant), TPU-native.

Counterpart of model/segment_anything/modeling/mask_decoder_multi_scale.py
(:16-213): per-scale TwoWayTransformer copies, a learned level embedding added
to the prompt tokens, and — for levels > 0 — a 2x feature upsample gated by
the sigmoid of the previous level's mean mask:
    src = (sigmoid(mean(previous_masks)) + 1) * upsample_2x(src)
The reference constructs this only in the dead `vision_tower_for_mask` branch
(model/walkgpt.py:80-92, SURVEY §2.2) — implemented here for capability parity.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import nn
from ..core.config import MaskDecoderConfig
from ..ops.resize import bilinear_resize
from . import sam_decoder
from .sam_prompt import _pe_encoding


def init(key, cfg: MaskDecoderConfig, *, image_feature_scale_num: int = 1,
         dtype=jnp.float32):
    keys = jax.random.split(key, 10 + cfg.num_mask_tokens
                            + image_feature_scale_num)
    d = cfg.transformer_dim
    return {
        "transformers": [sam_decoder.twoway_transformer_init(keys[i], cfg, dtype)
                         for i in range(image_feature_scale_num)],
        "iou_token": nn.embedding_init(keys[-1], 1, d, std=1.0, dtype=dtype),
        "mask_tokens": nn.embedding_init(keys[-2], cfg.num_mask_tokens, d,
                                         std=1.0, dtype=dtype),
        "level_embed": nn.embedding_init(keys[-3], image_feature_scale_num, d,
                                         std=1.0, dtype=dtype),
        # 8x-channel-reduction upscale (differs from the base decoder's 2-stage)
        "output_upscaling": {
            "conv": nn.conv_transpose2d_init(keys[-4], d, d // 8, (2, 2),
                                             dtype=dtype),
            "ln": nn.layer_norm_init(d // 8, dtype),
        },
        "upsample_2x": {
            "conv": nn.conv_transpose2d_init(keys[-5], d, d, (2, 2), dtype=dtype),
            "ln": nn.layer_norm_init(d, dtype),
        },
        "pe_gaussian": jax.random.normal(keys[-6], (2, d // 2), jnp.float32),
        "hypernet_mlps": [nn.relu_mlp_stack_init(keys[i], [d, d, d, d // 8],
                                                 dtype=dtype)
                          for i in range(cfg.num_mask_tokens)],
        "iou_head": nn.relu_mlp_stack_init(
            keys[cfg.num_mask_tokens],
            [d] + [cfg.iou_head_hidden_dim] * (cfg.iou_head_depth - 1)
            + [cfg.num_mask_tokens], dtype=dtype),
    }


def _dense_pe(params, hw: Tuple[int, int]) -> jnp.ndarray:
    h, w = hw
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)
    return _pe_encoding(params, grid)[None]


def apply(p, cfg: MaskDecoderConfig, *, image_embeddings: jnp.ndarray,
          image_pe: jnp.ndarray, sparse_prompt: jnp.ndarray,
          dense_prompt: jnp.ndarray, multimask_output: bool,
          level_num: int, previous_masks: Optional[jnp.ndarray] = None
          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NHWC analogue of MaskDecoderMultiScale.forward. Note the multimask
    slice here is [0:None] (the PixelLM variant keeps all tokens)."""
    b = sparse_prompt.shape[0]
    d = cfg.transformer_dim
    out_tokens = jnp.concatenate([p["iou_token"]["w"], p["mask_tokens"]["w"]], 0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens[None], (b, *out_tokens.shape)),
         sparse_prompt.astype(out_tokens.dtype)], axis=1)
    tokens = tokens + p["level_embed"]["w"][level_num]

    src = jnp.broadcast_to(image_embeddings, (b, *image_embeddings.shape[1:]))
    if level_num > 0:
        assert previous_masks is not None
        u = p["upsample_2x"]
        src = nn.gelu_exact(nn.layer_norm2d(
            u["ln"], nn.conv_transpose2d(u["conv"], src, stride=(2, 2))))
        h, w = src.shape[1], src.shape[2]
        prev = previous_masks.mean(axis=1)                       # [B, h, w]
        gate = jax.nn.sigmoid(prev)[..., None] + 1.0
        src = src * gate
        image_pe = _dense_pe(p, (h, w))
        dense_prompt = bilinear_resize(dense_prompt, (h, w))
    src = src + dense_prompt
    h, w = src.shape[1], src.shape[2]

    hs, src_out = sam_decoder.twoway_transformer(
        p["transformers"][level_num], src, image_pe, tokens,
        cfg.transformer_num_heads)
    iou_token_out = hs[:, 0]
    mask_tokens_out = hs[:, 1:1 + cfg.num_mask_tokens]

    src_maps = src_out.reshape(b, h, w, d)
    up = p["output_upscaling"]
    upscaled = nn.gelu_exact(nn.layer_norm2d(
        up["ln"], nn.conv_transpose2d(up["conv"], src_maps, stride=(2, 2))))
    hyper_in = jnp.stack(
        [nn.relu_mlp_stack(p["hypernet_mlps"][i], mask_tokens_out[:, i])
         for i in range(cfg.num_mask_tokens)], axis=1)
    uh, uw, uc = upscaled.shape[1], upscaled.shape[2], upscaled.shape[3]
    masks = jnp.einsum("btc,bpc->btp", hyper_in,
                       upscaled.reshape(b, uh * uw, uc)
                       ).reshape(b, cfg.num_mask_tokens, uh, uw)
    iou_pred = nn.relu_mlp_stack(p["iou_head"], iou_token_out)
    sl = slice(0, None) if multimask_output else slice(0, 1)
    return masks[:, sl], iou_pred[:, sl]
