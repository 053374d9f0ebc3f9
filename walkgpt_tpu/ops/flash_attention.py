"""Pallas TPU flash attention.

Replaces the reference's native attention kernels (SURVEY §2.6): the vendored
Triton flash kernel (mpt/flash_attn_triton.py) and flash-attn CUDA
(llama monkey patch) on the LLM side, and the O(N²)-materialized rel-pos
attention of the SAM ViT encoder (image_encoder.py:227-251) on the vision side.

Two kernels, one online-softmax core:
  * `flash_attention(q, k, v, causal=..., key_valid=...)` — LLM prefill /
    training fwd. Per (batch*head, q-block) program; k/v stream through VMEM;
    fp32 online softmax; causal blocks short-circuit fully-masked tiles.
  * `sam_flash_attention(q, k, v, rel_h, rel_w)` — SAM global attention with
    MViTv2 decomposed relative-position bias. The full [N, N] bias is never
    materialized: for a key tile spanning rows of the (kh, kw) key grid the
    bias tile is rel_h[:, rows][..., None] + rel_w[:, None, :], computed in
    VMEM from two [N, 64]-ish operands.

Both are wrapped in jax.custom_vjp whose backward recomputes attention with
the exact einsum formulation — the true gradient of softmax attention — so
the kernels are usable inside the training step.

Tile sizes: bq=256, bk=512 (=8x64 key-grid rows for SAM). All shapes padded
by the callers to multiples; masking keeps semantics exact.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import mha

DEFAULT_BQ = 256
DEFAULT_BK = 512
NEG_INF = -1e30


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on the CPU test backend.
    return jax.default_backend() == "cpu"


def _fwd_kernel(q_ref, k_ref, v_ref, kvalid_ref, o_ref, *, bk: int,
                causal: bool, scale: float, q_offset: int):
    """One (batch*head, q-block) program.

    q_ref: [bq, D]; k_ref/v_ref: [M, D]; kvalid_ref: [1, M] bool mask
    (always provided; the caller passes all-True when unmasked).
    """
    bq, d = q_ref.shape
    m_tot = k_ref.shape[0]
    iq = pl.program_id(1)

    q = q_ref[:].astype(jnp.float32) * scale
    q_pos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + q_offset

    num_kb = m_tot // bk

    def body(jk, carry):
        m_i, l_i, acc = carry
        k = k_ref[pl.ds(jk * bk, bk), :].astype(jnp.float32)
        v = v_ref[pl.ds(jk * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [bq, bk]
        kv = kvalid_ref[0, pl.ds(jk * bk, bk)]
        mask = jnp.broadcast_to((kv != 0)[None, :], (bq, bk))
        if causal:
            k_pos = jk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            mask = mask & (k_pos <= q_pos)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    init = (jnp.full((bq, 1), NEG_INF, jnp.float32),
            jnp.zeros((bq, 1), jnp.float32),
            jnp.zeros((bq, d), jnp.float32))

    if causal:
        # skip key blocks entirely above the diagonal
        last_q = q_offset + (iq + 1) * bq - 1
        num_live = jnp.minimum((last_q // bk) + 1, num_kb)
        m_i, l_i, acc = jax.lax.fori_loop(0, num_live, body, init)
    else:
        m_i, l_i, acc = jax.lax.fori_loop(0, num_kb, body, init)

    o_ref[:] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


def _flash_fwd(q, k, v, key_valid, *, causal: bool, bq: int, bk: int,
               q_offset: int):
    b, h, n, d = q.shape
    m = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, m, d)
    vf = v.reshape(b * h, m, d)
    if key_valid is None:
        kvf = jnp.ones((b, m), jnp.int32)
    else:
        kvf = key_valid.astype(jnp.int32)
    # broadcast per-batch key mask across heads -> [B*H, 1, M]
    kvf = jnp.broadcast_to(kvf[:, None, :], (b, h, m)).reshape(b * h, 1, m)

    grid = (b * h, pl.cdiv(n, bq))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, bk=bk, causal=causal, scale=scale,
                          q_offset=q_offset),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, d), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m, d), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m, d), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, m), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, bq, d), lambda bh, iq: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        interpret=_interpret(),
    )(qf, kf, vf, kvf)
    return out.reshape(b, h, n, d)


def _pad_len(n, block):
    return (-n) % block


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, causal: bool = False, bq: int = DEFAULT_BQ,
                    bk: int = DEFAULT_BK, key_valid=None):
    """q: [B, H, N, D]; k, v: [B, H, M, D]; key_valid: [B, M] bool or None.
    Causal semantics assume the query block is the *tail* of the key timeline
    (N == M, standard self-attention) — padding is handled internally."""
    return _flash_attention_impl(q, k, v, causal, bq, bk, key_valid)


def _flash_attention_impl(q, k, v, causal, bq, bk, key_valid):
    b, h, n, d = q.shape
    m = k.shape[2]
    # the kernel's causal mask aligns timeline STARTS (q_offset=0) while the
    # vjp's reference mask aligns ENDS; both agree only for self-attention
    assert not causal or n == m, "causal flash requires N == M self-attention"
    pn, pm = _pad_len(n, bq), _pad_len(m, bk)
    if key_valid is None:
        key_valid = jnp.ones((b, m), bool)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pn), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pm), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pm), (0, 0)))
    kv = jnp.pad(key_valid, ((0, 0), (0, pm)))
    out = _flash_fwd(qp, kp, vp, kv, causal=causal, bq=bq, bk=bk, q_offset=0)
    return out[:, :, :n]


def _flash_vjp_fwd(q, k, v, causal, bq, bk, key_valid):
    out = _flash_attention_impl(q, k, v, causal, bq, bk, key_valid)
    return out, (q, k, v, key_valid)


def _flash_vjp_bwd(causal, bq, bk, res, g):
    q, k, v, key_valid = res
    n, m = q.shape[2], k.shape[2]
    mask = None
    if key_valid is not None:
        mask = key_valid[:, None, None, :]
    if causal:
        cm = jnp.tril(jnp.ones((n, m), bool), k=m - n)[None, None]
        mask = cm if mask is None else (mask & cm)

    def ref_attn(q_, k_, v_):
        return mha(q_, k_, v_, mask=mask)

    _, vjp = jax.vjp(ref_attn, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


# ---------------------------------------------------------------------------
# SAM decomposed rel-pos flash attention
# ---------------------------------------------------------------------------

def _sam_fwd_kernel(q_ref, k_ref, v_ref, relh_ref, relw_ref, o_ref, *,
                    bk: int, kw: int, scale: float, m_valid: int):
    """q_ref: [bq, D]; k/v: [M, D]; relh_ref: [num_kb, bq, rows_per_block]
    (key-block-major so the per-block slice indexes a leading dim);
    relw_ref: [bq, KW]. Key index kk maps to grid cell (kk//kw, kk%kw);
    bias[qq, kk] = rel_h[qq, kk//kw] + rel_w[qq, kk%kw]. bk % kw == 0.

    The [bq, bk] bias tile is built with two constant expansion matmuls
    (rh @ E_r + rw @ E_w) — no lane-dim reshapes or slices, Mosaic-friendly."""
    bq, d = q_ref.shape
    m_tot = k_ref.shape[0]
    rpb = bk // kw

    q = q_ref[:].astype(jnp.float32)
    relw = relw_ref[:].astype(jnp.float32)

    # constant expansion matrices (compile-time)
    col = jax.lax.broadcasted_iota(jnp.int32, (rpb, bk), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rpb, bk), 0)
    e_r = (col // kw == row).astype(jnp.float32)              # [rpb, bk]
    colw = jax.lax.broadcasted_iota(jnp.int32, (kw, bk), 1)
    roww = jax.lax.broadcasted_iota(jnp.int32, (kw, bk), 0)
    e_w = (colw % kw == roww).astype(jnp.float32)             # [kw, bk]
    bias_w = jax.lax.dot_general(relw, e_w, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    def body(jk, carry):
        m_i, l_i, acc = carry
        k = k_ref[pl.ds(jk * bk, bk), :].astype(jnp.float32)
        v = v_ref[pl.ds(jk * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        rh = relh_ref[jk].astype(jnp.float32)                 # [bq, rpb]
        s = s + bias_w + jax.lax.dot_general(
            rh, e_r, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # mask key padding (m_valid keys are real)
        k_pos = jk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(k_pos < m_valid, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    init = (jnp.full((bq, 1), NEG_INF, jnp.float32),
            jnp.zeros((bq, 1), jnp.float32),
            jnp.zeros((bq, d), jnp.float32))
    m_i, l_i, acc = jax.lax.fori_loop(0, m_tot // bk, body, init)
    o_ref[:] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def sam_flash_attention(q, k, v, rel_h, rel_w, grid_hw, bq: int = DEFAULT_BQ,
                        bk: int = DEFAULT_BK):
    """SAM global attention with decomposed rel-pos bias.

    q/k/v: [B, H, N, D] with N = gh*gw; rel_h: [B, H, N, gh]; rel_w:
    [B, H, N, gw] (precomputed einsums of q with the rel-pos tables —
    ops/attention.decomposed_rel_pos_bias without the final broadcast-add).
    grid_hw: static (gh, gw)."""
    return _sam_flash_impl(q, k, v, rel_h, rel_w, grid_hw, bq, bk)


def _sam_flash_impl(q, k, v, rel_h, rel_w, grid_hw, bq, bk):
    b, h, n, d = q.shape
    gh, gw = grid_hw
    assert n == gh * gw
    # key tile = whole key-grid rows so the bias tile stays a broadcast-add;
    # never larger than the (row-padded) key count itself
    bk = (bk // gw) * gw if bk >= gw else gw
    bk = min(bk, ((n + gw - 1) // gw) * gw)
    bq = min(bq, ((n + 127) // 128) * 128)
    pn = _pad_len(n, bq)
    pm = _pad_len(n, bk)
    pad_rows = pm // gw if gw else 0
    assert pm % gw == 0

    rpb = bk // gw
    num_kb = (n + pm) // bk
    qf = jnp.pad(q, ((0, 0), (0, 0), (0, pn), (0, 0))).reshape(b * h, n + pn, d)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, pm), (0, 0))).reshape(b * h, n + pm, d)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, pm), (0, 0))).reshape(b * h, n + pm, d)
    # key-block-major rel_h: [BH, num_kb, N, rows_per_block]
    rhf = jnp.pad(rel_h, ((0, 0), (0, 0), (0, pn), (0, pad_rows)))
    rhf = rhf.reshape(b * h, n + pn, num_kb, rpb).transpose(0, 2, 1, 3)
    rwf = jnp.pad(rel_w, ((0, 0), (0, 0), (0, pn), (0, 0))
                  ).reshape(b * h, n + pn, gw)

    grid = (b * h, pl.cdiv(n + pn, bq))
    out = pl.pallas_call(
        functools.partial(_sam_fwd_kernel, bk=bk, kw=gw,
                          scale=1.0 / math.sqrt(d), m_valid=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, d), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n + pm, d), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n + pm, d), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, num_kb, bq, rpb), lambda bh, iq: (bh, 0, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, gw), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, bq, d), lambda bh, iq: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n + pn, d), q.dtype),
        interpret=_interpret(),
    )(qf, kf, vf, rhf, rwf)
    return out.reshape(b, h, n + pn, d)[:, :, :n]


def _sam_vjp_fwd(q, k, v, rel_h, rel_w, grid_hw, bq, bk):
    out = _sam_flash_impl(q, k, v, rel_h, rel_w, grid_hw, bq, bk)
    return out, (q, k, v, rel_h, rel_w)


def _sam_vjp_bwd(grid_hw, bq, bk, res, g):
    q, k, v, rel_h, rel_w = res
    gh, gw = grid_hw
    b, h, n, d = q.shape

    def ref_attn(q_, k_, v_, rh_, rw_):
        bias = (rh_[..., :, None] + rw_[..., None, :]).reshape(b, h, n, gh * gw)
        return mha(q_, k_, v_, bias=bias)

    _, vjp = jax.vjp(ref_attn, q, k, v, rel_h, rel_w)
    return vjp(g)


sam_flash_attention.defvjp(_sam_vjp_fwd, _sam_vjp_bwd)
