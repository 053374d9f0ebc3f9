"""SAM mask decoder + TwoWayTransformer, TPU-native.

Functional rewrite of model/segment_anything/modeling/mask_decoder.py:16-164
and transformer.py:16-242. Dense maps are NHWC; the transformer flattens them
to [B, HW, C] token sequences (small shapes — 4096x256 — so the reference
attention primitive is already MXU-friendly; no custom kernel needed here).

The WalkGPT text-prompt path drives this with one text embedding per [SEG]
token and multimask_output=False, selecting mask slice [0:1]
(model/walkgpt.py:716-739 — the self-consistent `evaluate()` semantics,
SURVEY WART-1; the rebuild uses these semantics everywhere).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import nn
from ..core.config import MaskDecoderConfig
from ..ops.attention import merge_heads, mha, split_heads


# ---------------------------------------------------------------------------
# downsampled attention (transformer.py:186-242)
# ---------------------------------------------------------------------------

def _attn_init(key, d_model: int, num_heads: int, downsample: int, dtype):
    d_int = d_model // downsample
    k = jax.random.split(key, 4)
    return {
        "q": nn.linear_init(k[0], d_model, d_int, dtype=dtype),
        "k": nn.linear_init(k[1], d_model, d_int, dtype=dtype),
        "v": nn.linear_init(k[2], d_model, d_int, dtype=dtype),
        "out": nn.linear_init(k[3], d_int, d_model, dtype=dtype),
    }


def _attn(p, q, k, v, nh):
    qh = split_heads(nn.linear(p["q"], q), nh)
    kh = split_heads(nn.linear(p["k"], k), nh)
    vh = split_heads(nn.linear(p["v"], v), nh)
    return nn.linear(p["out"], merge_heads(mha(qh, kh, vh)))


# ---------------------------------------------------------------------------
# two-way transformer
# ---------------------------------------------------------------------------

def _twoway_block_init(key, cfg: MaskDecoderConfig, dtype):
    k = jax.random.split(key, 6)
    d = cfg.transformer_dim
    return {
        "self_attn": _attn_init(k[0], d, cfg.transformer_num_heads, 1, dtype),
        "norm1": nn.layer_norm_init(d, dtype),
        "cross_t2i": _attn_init(k[1], d, cfg.transformer_num_heads,
                                cfg.attention_downsample_rate, dtype),
        "norm2": nn.layer_norm_init(d, dtype),
        "mlp": nn.mlp_init(k[2], d, cfg.transformer_mlp_dim, dtype=dtype),
        "norm3": nn.layer_norm_init(d, dtype),
        "cross_i2t": _attn_init(k[3], d, cfg.transformer_num_heads,
                                cfg.attention_downsample_rate, dtype),
        "norm4": nn.layer_norm_init(d, dtype),
    }


def _twoway_block(p, queries, keys, query_pe, key_pe, nh,
                  skip_first_layer_pe: bool):
    if skip_first_layer_pe:
        queries = _attn(p["self_attn"], queries, queries, queries, nh)
    else:
        q = queries + query_pe
        queries = queries + _attn(p["self_attn"], q, q, queries, nh)
    queries = nn.layer_norm(p["norm1"], queries)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _attn(p["cross_t2i"], q, k, keys, nh)
    queries = nn.layer_norm(p["norm2"], queries)

    queries = queries + nn.mlp(p["mlp"], queries, act=jax.nn.relu)
    queries = nn.layer_norm(p["norm3"], queries)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _attn(p["cross_i2t"], k, q, queries, nh)
    keys = nn.layer_norm(p["norm4"], keys)
    return queries, keys


def twoway_transformer_init(key, cfg: MaskDecoderConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.transformer_depth + 1)
    return {
        "layers": [_twoway_block_init(keys[i], cfg, dtype)
                   for i in range(cfg.transformer_depth)],
        "final_attn": _attn_init(keys[-1], cfg.transformer_dim,
                                 cfg.transformer_num_heads,
                                 cfg.attention_downsample_rate, dtype),
        "norm_final": nn.layer_norm_init(cfg.transformer_dim, dtype),
    }


def twoway_transformer(p, image_embedding: jnp.ndarray, image_pe: jnp.ndarray,
                       point_embedding: jnp.ndarray, nh: int = 8
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """image_embedding/image_pe: [B, H, W, C]; point_embedding: [B, N, C]."""
    b, h, w, c = image_embedding.shape
    keys = image_embedding.reshape(b, h * w, c)
    key_pe = image_pe.reshape(image_pe.shape[0], h * w, c)
    key_pe = jnp.broadcast_to(key_pe, keys.shape)
    queries = point_embedding
    for i, layer in enumerate(p["layers"]):
        queries, keys = _twoway_block(layer, queries, keys, point_embedding,
                                      key_pe, nh, skip_first_layer_pe=(i == 0))
    q = queries + point_embedding
    k = keys + key_pe
    queries = queries + _attn(p["final_attn"], q, k, keys, nh)
    queries = nn.layer_norm(p["norm_final"], queries)
    return queries, keys


# ---------------------------------------------------------------------------
# mask decoder
# ---------------------------------------------------------------------------

def init(key, cfg: MaskDecoderConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 8 + cfg.num_mask_tokens)
    d = cfg.transformer_dim
    return {
        "transformer": twoway_transformer_init(keys[0], cfg, dtype),
        "iou_token": nn.embedding_init(keys[1], 1, d, std=1.0, dtype=dtype),
        "mask_tokens": nn.embedding_init(keys[2], cfg.num_mask_tokens, d,
                                         std=1.0, dtype=dtype),
        "upscale_conv1": nn.conv_transpose2d_init(keys[3], d, d // 4, (2, 2),
                                                  dtype=dtype),
        "upscale_ln": nn.layer_norm_init(d // 4, dtype),
        "upscale_conv2": nn.conv_transpose2d_init(keys[4], d // 4, d // 8, (2, 2),
                                                  dtype=dtype),
        "hypernet_mlps": [nn.relu_mlp_stack_init(keys[5 + i], [d, d, d, d // 8],
                                                 dtype=dtype)
                          for i in range(cfg.num_mask_tokens)],
        "iou_head": nn.relu_mlp_stack_init(
            keys[5 + cfg.num_mask_tokens],
            [d] + [cfg.iou_head_hidden_dim] * (cfg.iou_head_depth - 1)
            + [cfg.num_mask_tokens], dtype=dtype),
    }


def predict_masks(p, cfg: MaskDecoderConfig, image_embeddings: jnp.ndarray,
                  image_pe: jnp.ndarray, sparse_prompt: jnp.ndarray,
                  dense_prompt: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """image_embeddings: [1 or B, H, W, C]; sparse_prompt: [B, N, C];
    dense_prompt: [B, H, W, C]. Returns (masks [B, T, 4H, 4W], iou [B, T])."""
    b = sparse_prompt.shape[0]
    out_tokens = jnp.concatenate([p["iou_token"]["w"], p["mask_tokens"]["w"]], axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens[None], (b, *out_tokens.shape)),
         sparse_prompt.astype(out_tokens.dtype)], axis=1)

    src = jnp.broadcast_to(image_embeddings,
                           (b, *image_embeddings.shape[1:])) + dense_prompt
    hs, src_out = twoway_transformer(p["transformer"], src, image_pe, tokens,
                                     cfg.transformer_num_heads)
    iou_token_out = hs[:, 0]
    mask_tokens_out = hs[:, 1:1 + cfg.num_mask_tokens]

    h, w = src.shape[1], src.shape[2]
    src_maps = src_out.reshape(b, h, w, cfg.transformer_dim)
    up = nn.conv_transpose2d(p["upscale_conv1"], src_maps, stride=(2, 2))
    up = nn.gelu_exact(nn.layer_norm2d(p["upscale_ln"], up))
    up = nn.gelu_exact(nn.conv_transpose2d(p["upscale_conv2"], up, stride=(2, 2)))

    hyper_in = jnp.stack(
        [nn.relu_mlp_stack(p["hypernet_mlps"][i], mask_tokens_out[:, i])
         for i in range(cfg.num_mask_tokens)], axis=1)          # [B, T, C/8]
    uh, uw, uc = up.shape[1], up.shape[2], up.shape[3]
    masks = jnp.einsum("btc,bpc->btp", hyper_in,
                       up.reshape(b, uh * uw, uc)).reshape(b, cfg.num_mask_tokens,
                                                           uh, uw)
    iou_pred = nn.relu_mlp_stack(p["iou_head"], iou_token_out)
    return masks, iou_pred


def apply(p, cfg: MaskDecoderConfig, *, image_embeddings: jnp.ndarray,
          image_pe: jnp.ndarray, sparse_prompt: jnp.ndarray,
          dense_prompt: jnp.ndarray, multimask_output: bool
          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    masks, iou_pred = predict_masks(p, cfg, image_embeddings, image_pe,
                                    sparse_prompt, dense_prompt)
    sl = slice(1, None) if multimask_output else slice(0, 1)
    return masks[:, sl], iou_pred[:, sl]
