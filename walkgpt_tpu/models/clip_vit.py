"""CLIP ViT vision tower, TPU-native.

Functional rewrite of the reference tower
(model/llava_walkgpt/model/multimodal_encoder/clip_encoder.py:6-125 and the
padding-mask variant custom_clip.py:27-152):
  * position embeddings trained at 224px are bilinearly resized to the 448px
    patch grid at init/load time (clip_encoder.py:38-55);
  * an optional token-level attention mask supports the padded-image path
    (class token always attended);
  * feature selection returns hidden_states[select_layer][:, 1:] plus the aux
    level hidden_states[aux_layer] (clip_encoder.py:61-69).

CLIP uses quick-GELU (x * sigmoid(1.702 x)) and pre-LN blocks.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import nn
from ..core.config import CLIPVisionConfig
from ..ops.attention import merge_heads, mha, split_heads
from ..ops.resize import bilinear_resize


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def init(key, cfg: CLIPVisionConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_layers + 4)
    grid = cfg.grid
    params = {
        "patch_embed": nn.conv2d_init(keys[0], 3, cfg.hidden_size,
                                      (cfg.patch_size, cfg.patch_size),
                                      bias=False, dtype=dtype),
        "class_embed": nn.trunc_normal(keys[1], (cfg.hidden_size,), std=0.02,
                                       dtype=dtype),
        # stored at the *target* grid; converters resize the 224px pretrain one
        "pos_embed": nn.trunc_normal(keys[2], (1 + grid * grid, cfg.hidden_size),
                                     std=0.02, dtype=dtype),
        "pre_ln": nn.layer_norm_init(cfg.hidden_size, dtype),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[3 + i], 5)
        params["layers"].append({
            "ln1": nn.layer_norm_init(cfg.hidden_size, dtype),
            "attn": {
                "q": nn.linear_init(k[0], cfg.hidden_size, cfg.hidden_size, dtype=dtype),
                "k": nn.linear_init(k[1], cfg.hidden_size, cfg.hidden_size, dtype=dtype),
                "v": nn.linear_init(k[2], cfg.hidden_size, cfg.hidden_size, dtype=dtype),
                "out": nn.linear_init(k[3], cfg.hidden_size, cfg.hidden_size, dtype=dtype),
            },
            "ln2": nn.layer_norm_init(cfg.hidden_size, dtype),
            "mlp": nn.mlp_init(k[4], cfg.hidden_size, cfg.mlp_dim, dtype=dtype),
        })
    return params


def resize_pos_embed(pos_embed: jnp.ndarray, src_grid: int, dst_grid: int) -> jnp.ndarray:
    """[1+s*s, C] -> [1+d*d, C]: class position kept, patch grid bilinear-resized
    (clip_encoder.py:38-55 semantics)."""
    if src_grid == dst_grid:
        return pos_embed
    cls, patch = pos_embed[:1], pos_embed[1:]
    c = patch.shape[-1]
    grid = patch.reshape(src_grid, src_grid, c)
    grid = bilinear_resize(grid[None], (dst_grid, dst_grid))[0]
    return jnp.concatenate([cls, grid.reshape(dst_grid * dst_grid, c)], axis=0)


def apply(params, cfg: CLIPVisionConfig, images: jnp.ndarray, *,
          attention_mask: Optional[jnp.ndarray] = None
          ) -> List[jnp.ndarray]:
    """images: [B, S, S, 3] NHWC. attention_mask: optional [B, 1+P] bool over
    [class]+patch tokens. Returns all hidden states (embeddings + per layer),
    so callers select cfg.select_layer / cfg.aux_layer."""
    b = images.shape[0]
    x = nn.conv2d(params["patch_embed"], images,
                  stride=(cfg.patch_size, cfg.patch_size), padding="VALID")
    x = x.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(params["class_embed"][None, None],
                           (b, 1, cfg.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][None].astype(x.dtype)
    x = nn.layer_norm(params["pre_ln"], x, eps=cfg.ln_eps)

    mask = None
    if attention_mask is not None:
        mask = attention_mask[:, None, None, :]     # [B,1,1,N] keys masked

    hidden_states = [x]
    for layer in params["layers"]:
        h = nn.layer_norm(layer["ln1"], x, eps=cfg.ln_eps)
        a = layer["attn"]
        att = mha(split_heads(nn.linear(a["q"], h), cfg.num_heads),
                  split_heads(nn.linear(a["k"], h), cfg.num_heads),
                  split_heads(nn.linear(a["v"], h), cfg.num_heads),
                  mask=mask)
        x = x + nn.linear(a["out"], merge_heads(att))
        h = nn.layer_norm(layer["ln2"], x, eps=cfg.ln_eps)
        x = x + nn.mlp(layer["mlp"], h, act=quick_gelu)
        hidden_states.append(x)
    return hidden_states


def select_features(hidden_states: List[jnp.ndarray], cfg: CLIPVisionConfig
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(select-layer patch features [B, P, C], aux-layer features)."""
    feats = hidden_states[cfg.select_layer][:, 1:]
    aux = hidden_states[cfg.aux_layer][:, 1:]
    return feats, aux
