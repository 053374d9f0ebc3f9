"""WalkGPT's two novel projector modules + the tiny InfoNCE pooling head.

  * MSQP — MultiScaleQFormerProjector (reference utils/utils_walkgpt.py:220-300):
    SAM grid tokens [B, L, 256] -> 32 queries at 4 pooling scales
    (x1/x2/x4/global: 12+8+8+4) through 2-layer cross-attention stacks at
    d=1024 with a segmentation-aware sigmoid gate, padded to a 6x6=36 square
    with a learned pad token, projected to the LLM width.
  * CTP — CalibratedTextProjector (:302-327): LN -> Linear(H, 2*256) -> GELU ->
    Linear(256) -> LN, plus a learned text-type vector and log-temperature;
    output L2-normalized then scaled.
  * TinyCrossAttn (:330-357): single-head QKV-linear attention pooling used to
    produce InfoNCE positives.

All are pure functions over param pytrees; attention uses the shared `mha`
primitive so the fp32-softmax policy is uniform.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import nn
from ..core.config import CTPConfig, MSQPConfig
from ..ops.attention import merge_heads, mha, split_heads


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _xattn_block_init(key, d_model: int, num_heads: int, mlp_ratio: float, dtype):
    k = jax.random.split(key, 5)
    return {
        "q_norm": nn.layer_norm_init(d_model, dtype),
        "kv_norm": nn.layer_norm_init(d_model, dtype),
        # torch nn.MultiheadAttention: in-proj (q,k,v) with bias + out-proj
        "attn": {
            "q": nn.linear_init(k[0], d_model, d_model, dtype=dtype),
            "k": nn.linear_init(k[1], d_model, d_model, dtype=dtype),
            "v": nn.linear_init(k[2], d_model, d_model, dtype=dtype),
            "out": nn.linear_init(k[3], d_model, d_model, dtype=dtype),
        },
        "ffn": {
            "norm": nn.layer_norm_init(d_model, dtype),
            "mlp": nn.mlp_init(k[4], d_model, int(d_model * mlp_ratio), dtype=dtype),
        },
    }


def _xattn_block(p, queries: jnp.ndarray, kv: jnp.ndarray,
                 num_heads: int) -> jnp.ndarray:
    """Pre-LN cross-attention + FFN with residuals (CrossAttnBlock :163-185)."""
    nh = num_heads
    q = nn.layer_norm(p["q_norm"], queries)
    k = nn.layer_norm(p["kv_norm"], kv)
    a = p["attn"]
    out = mha(split_heads(nn.linear(a["q"], q), nh),
              split_heads(nn.linear(a["k"], k), nh),
              split_heads(nn.linear(a["v"], k), nh))
    out = queries + nn.linear(a["out"], merge_heads(out))
    h = nn.layer_norm(p["ffn"]["norm"], out)
    return out + nn.mlp(p["ffn"]["mlp"], h, act=nn.gelu_exact)


def _pool_grid(tokens: jnp.ndarray, h: int, w: int, scale: int) -> jnp.ndarray:
    """Average-pool a [B, H*W, C] token grid by `scale` (:195-201)."""
    b, _, c = tokens.shape
    x = tokens.reshape(b, h, w, c)
    x = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                              (1, scale, scale, 1), (1, scale, scale, 1), "VALID")
    x = x / (scale * scale)
    hp, wp = h // scale, w // scale
    return x.reshape(b, hp * wp, c)


# ---------------------------------------------------------------------------
# MSQP
# ---------------------------------------------------------------------------

def msqp_init(key, cfg: MSQPConfig, llm_dim: int, dtype=jnp.float32):
    keys = jax.random.split(key, 16)
    d = cfg.d_proj

    def queries(k, n):
        return nn.trunc_normal(k, (1, n, d), std=0.02, dtype=dtype) if n else None

    def stack(kk):
        ks = jax.random.split(kk, cfg.num_layers)
        return [_xattn_block_init(k, d, cfg.num_heads, cfg.mlp_ratio, dtype)
                for k in ks]

    return {
        "sam_to_proj": nn.linear_init(keys[0], cfg.sam_dim, d, dtype=dtype),
        "q_x1": queries(keys[1], cfg.queries_x1),
        "q_x2": queries(keys[2], cfg.queries_x2),
        "q_x4": queries(keys[3], cfg.queries_x4),
        "q_global": queries(keys[4], cfg.queries_global),
        "cross_x1": stack(keys[5]) if cfg.queries_x1 else None,
        "cross_x2": stack(keys[6]) if cfg.queries_x2 else None,
        "cross_x4": stack(keys[7]) if cfg.queries_x4 else None,
        "cross_glb": stack(keys[8]) if cfg.queries_global else None,
        "gate": {
            "norm": nn.layer_norm_init(d, dtype),
            "fc1": nn.linear_init(keys[9], d, cfg.gate_hidden, dtype=dtype),
            "fc2": nn.linear_init(keys[10], cfg.gate_hidden, 1, dtype=dtype),
        },
        "pad_token": nn.trunc_normal(keys[11], (1, 1, d), std=0.02, dtype=dtype),
        "to_llama": nn.linear_init(keys[12], d, llm_dim, dtype=dtype),
    }


def _gate(p, kv: jnp.ndarray) -> jnp.ndarray:
    """SegAwareGate (:204-217): sigmoid token gate."""
    h = nn.layer_norm(p["norm"], kv)
    logits = nn.linear(p["fc2"], nn.gelu_exact(nn.linear(p["fc1"], h)))
    return kv * jax.nn.sigmoid(logits)


def msqp_apply(params, cfg: MSQPConfig, sam_tokens: jnp.ndarray) -> jnp.ndarray:
    """sam_tokens: [B, L, sam_dim] (L a perfect square) -> [B, s*s, llm_dim]."""
    b, l, _ = sam_tokens.shape
    h = w = int(math.isqrt(l))
    assert h * w == l, f"token length {l} is not a perfect square"

    feats = nn.linear(params["sam_to_proj"], sam_tokens)

    scales = []
    if cfg.queries_x1:
        scales.append(("q_x1", "cross_x1", feats))
    if cfg.queries_x2:
        scales.append(("q_x2", "cross_x2", _pool_grid(feats, h, w, 2)))
    if cfg.queries_x4:
        scales.append(("q_x4", "cross_x4", _pool_grid(feats, h, w, 4)))
    if cfg.queries_global:
        scales.append(("q_global", "cross_glb", feats.mean(axis=1, keepdims=True)))

    outs = []
    for q_name, stack_name, kv in scales:
        kv = _gate(params["gate"], kv)
        q = jnp.broadcast_to(params[q_name],
                             (b, *params[q_name].shape[1:])).astype(kv.dtype)
        for blk in params[stack_name]:
            q = _xattn_block(blk, q, kv, cfg.num_heads)
        outs.append(q)

    vis = jnp.concatenate(outs, axis=1)                     # [B, num_queries, d]
    pad = cfg.num_tokens - cfg.num_queries
    assert pad >= 0, "target_square_side too small"
    if pad > 0:
        pad_tok = jnp.broadcast_to(params["pad_token"],
                                   (b, pad, vis.shape[-1])).astype(vis.dtype)
        vis = jnp.concatenate([vis, pad_tok], axis=1)        # [B, s*s, d]
    return nn.linear(params["to_llama"], vis)


# ---------------------------------------------------------------------------
# CTP
# ---------------------------------------------------------------------------

def ctp_init(key, cfg: CTPConfig, in_dim: int, dtype=jnp.float32):
    k = jax.random.split(key, 2)
    mid = max(cfg.out_dim * cfg.widen, cfg.out_dim)
    return {
        "norm_in": nn.layer_norm_init(in_dim, dtype),
        "fc1": nn.linear_init(k[0], in_dim, mid, dtype=dtype),
        # reference initializes the second linear orthogonally with gain 0.5
        "fc2": nn.linear_init(k[1], mid, cfg.out_dim, init="orthogonal",
                              std=0.5, dtype=dtype),
        "norm_out": nn.layer_norm_init(cfg.out_dim, dtype),
        "text_type": jnp.zeros((cfg.out_dim,), dtype),
        "log_temp": jnp.zeros((1,), dtype),
    }


def ctp_apply(params, x: jnp.ndarray, *, eps: float = 1e-12) -> jnp.ndarray:
    """[..., in_dim] -> [..., out_dim], L2-normalized * exp(log_temp)."""
    y = nn.layer_norm(params["norm_in"], x)
    y = nn.gelu_exact(nn.linear(params["fc1"], y))
    y = nn.linear(params["fc2"], y)
    y = nn.layer_norm(params["norm_out"], y)
    y = y + params["text_type"].astype(y.dtype)
    norm = jnp.maximum(jnp.linalg.norm(y.astype(jnp.float32), axis=-1,
                                       keepdims=True), eps)
    scale = jnp.exp(params["log_temp"].astype(jnp.float32))[0]
    return (y.astype(jnp.float32) / norm * scale).astype(x.dtype)


# ---------------------------------------------------------------------------
# TinyCrossAttn
# ---------------------------------------------------------------------------

def tiny_xattn_init(key, d: int = 256, dtype=jnp.float32):
    k = jax.random.split(key, 4)
    return {
        "wq": nn.linear_init(k[0], d, d, bias=False, dtype=dtype),
        "wk": nn.linear_init(k[1], d, d, bias=False, dtype=dtype),
        "wv": nn.linear_init(k[2], d, d, bias=False, dtype=dtype),
        "out": nn.linear_init(k[3], d, d, bias=False, dtype=dtype),
    }


def tiny_xattn_apply(params, q_vec: jnp.ndarray, kv: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q_vec: [M, d]; kv: [M, N, d] -> (pooled [M, d], attn [M, N])."""
    d = kv.shape[-1]
    q = nn.linear(params["wq"], q_vec)[:, None, :]
    k = nn.linear(params["wk"], kv)
    v = nn.linear(params["wv"], kv)
    logits = jnp.einsum("mqd,mnd->mqn", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d)
    attn = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("mqn,mnd->mqd", attn.astype(v.dtype), v)[:, 0]
    return nn.linear(params["out"], ctx), attn[:, 0]
