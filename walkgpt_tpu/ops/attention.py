"""Attention ops.

`mha` is the reference einsum implementation (exact softmax numerics, fp32
accumulation) used for parity tests and small modules; the Pallas flash
kernels in ops/flash_attention.py plug in behind the same signature for the
hot paths (LLM decoder, SAM ViT encoder).

Windowed-attention helpers and decomposed relative-position bias follow the
behavior of the reference SAM encoder (model/segment_anything/modeling/
image_encoder.py:258-391) but are laid out for XLA: the rel-pos bias is a
plain additive bias tensor fed to the same attention primitive, so flash and
reference paths share it.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
        bias: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        scale: Optional[float] = None) -> jnp.ndarray:
    """Multi-head attention over [B, H, N, D] tensors.

    bias: additive logits bias broadcastable to [B, H, Nq, Nk].
    mask: boolean, True = attend, broadcastable to [B, H, Nq, Nk].
    Softmax in fp32; output in q.dtype.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return out


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, N, C] -> [B, H, N, C/H]"""
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, N, D] -> [B, N, H*D]"""
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


# ---------------------------------------------------------------------------
# window partitioning (SAM ViT)
# ---------------------------------------------------------------------------

def window_partition(x: jnp.ndarray, window: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """[B, H, W, C] -> [B*nW, ws, ws, C] with bottom/right zero padding."""
    b, h, w, c = x.shape
    pad_h = (-h) % window
    pad_w = (-w) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return windows, (hp, wp)


def window_unpartition(windows: jnp.ndarray, window: int,
                       pad_hw: Tuple[int, int], hw: Tuple[int, int]) -> jnp.ndarray:
    """Inverse of window_partition; removes padding."""
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // ((hp // window) * (wp // window))
    x = windows.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


# ---------------------------------------------------------------------------
# decomposed relative-position bias (SAM ViT / MViTv2)
# ---------------------------------------------------------------------------

def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Select (and if necessary linearly resample) relative position embeddings
    (image_encoder.py:321-348 semantics)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(rel_pos, (max_rel_dist, rel_pos.shape[1]),
                                   method="linear", antialias=False)
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def decomposed_rel_pos_bias(q: jnp.ndarray, rel_pos_h: jnp.ndarray,
                            rel_pos_w: jnp.ndarray, q_size: Tuple[int, int],
                            k_size: Tuple[int, int]) -> jnp.ndarray:
    """Additive attention bias from decomposed rel-pos embeddings.

    q: [B, H, qh*qw, D] per-head queries.
    Returns bias [B, H, qh*qw, kh*kw] (fp32).
    """
    qh, qw = q_size
    kh, kw = k_size
    rh = get_rel_pos(qh, kh, rel_pos_h)          # [qh, kh, D]
    rw = get_rel_pos(qw, kw, rel_pos_w)          # [qw, kw, D]
    b, h, _, d = q.shape
    r_q = q.reshape(b, h, qh, qw, d).astype(jnp.float32)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, rh.astype(jnp.float32))
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, rw.astype(jnp.float32))
    bias = rel_h[..., :, None] + rel_w[..., None, :]   # [B,H,qh,qw,kh,kw]
    return bias.reshape(b, h, qh * qw, kh * kw)
