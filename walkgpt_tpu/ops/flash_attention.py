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

Both have REAL Pallas backward kernels (the TPU counterpart of the Triton
bwd, mpt/flash_attn_triton.py:270-750): the forward also emits the per-row
logsumexp; the backward recomputes probability tiles from (q, k, lse) in VMEM
and runs as two kernels — dq over q-blocks and dk/dv over k-blocks — so no
[N, N] logits tensor ever exists in HBM under grad. The SAM variant also
produces rel_h/rel_w gradients (they feed trainable rel-pos tables when the
towers are unfrozen).

Tile sizes: bq=256, bk=512 (=8x64 key-grid rows for SAM). All shapes padded
by the callers to multiples; masking keeps semantics exact.
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BQ = 256
DEFAULT_BK = 512
NEG_INF = -1e30


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on the CPU test backend.
    return jax.default_backend() == "cpu"


def _fwd_kernel(q_ref, k_ref, v_ref, kvalid_ref, o_ref, lse_ref, *, bk: int,
                causal: bool, scale: float, q_offset: int):
    """One (batch*head, q-block) program.

    q_ref: [bq, D]; k_ref/v_ref: [M, D]; kvalid_ref: [1, M] bool mask
    (always provided; the caller passes all-True when unmasked).
    Emits o and the per-row logsumexp (lse) residual for the backward.
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
    lse_ref[:] = m_i + jnp.log(jnp.maximum(l_i, 1e-30))


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
    out, lse = pl.pallas_call(
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
        out_specs=(
            pl.BlockSpec((None, bq, d), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, 1), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(qf, kf, vf, kvf)
    return out.reshape(b, h, n, d), lse


def _dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, kvalid_ref,
               dq_ref, *, bk: int, causal: bool, scale: float):
    """dq for one (batch*head, q-block): loop over key blocks, recompute the
    probability tile from lse, dlogits = p * (g v^T - delta), dq += dlogits k.
    """
    bq, d = q_ref.shape
    m_tot = k_ref.shape[0]
    iq = pl.program_id(1)

    q = q_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    lse = lse_ref[:].astype(jnp.float32)           # [bq, 1]
    delta = delta_ref[:].astype(jnp.float32)       # [bq, 1]
    q_pos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    num_kb = m_tot // bk

    def body(jk, dq_acc):
        k = k_ref[pl.ds(jk * bk, bk), :].astype(jnp.float32)
        v = v_ref[pl.ds(jk * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        kv = kvalid_ref[0, pl.ds(jk * bk, bk)]
        mask = jnp.broadcast_to((kv != 0)[None, :], (bq, bk))
        if causal:
            k_pos = jk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            mask = mask & (k_pos <= q_pos)
        s = jnp.where(mask, s, NEG_INF)
        # explicit zero at masked positions: for a fully-masked row s and lse
        # are both ~NEG_INF, so exp(s - lse) would be ~1, not 0
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)   # [bq, bk]
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq_acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    if causal:
        last_q = (iq + 1) * bq - 1
        num_live = jnp.minimum((last_q // bk) + 1, num_kb)
        dq = jax.lax.fori_loop(0, num_live, body, jnp.zeros((bq, d), jnp.float32))
    else:
        dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[:] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, kvalid_ref,
                dk_ref, dv_ref, *, bq: int, causal: bool, scale: float):
    """dk/dv for one (batch*head, k-block): loop over query blocks."""
    bk, d = k_ref.shape
    n_tot = q_ref.shape[0]
    jk = pl.program_id(1)

    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    kv = kvalid_ref[0, :]
    num_qb = n_tot // bq
    k_pos = jk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)

    def body(jq, carry):
        dk_acc, dv_acc = carry
        q = q_ref[pl.ds(jq * bq, bq), :].astype(jnp.float32)
        g = g_ref[pl.ds(jq * bq, bq), :].astype(jnp.float32)
        lse = lse_ref[pl.ds(jq * bq, bq), :].astype(jnp.float32)
        delta = delta_ref[pl.ds(jq * bq, bq), :].astype(jnp.float32)
        s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mask = jnp.broadcast_to((kv != 0)[None, :], (bq, bk))
        if causal:
            q_pos = jq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            mask = mask & (k_pos <= q_pos)
        s = jnp.where(mask, s, NEG_INF)
        # see _dq_kernel: masked positions must be exactly 0
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dv_new = dv_acc + jax.lax.dot_general(
            p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_new = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dk_new, dv_new

    init = (jnp.zeros((bk, d), jnp.float32), jnp.zeros((bk, d), jnp.float32))
    if causal:
        # queries below the diagonal only: first q block containing jk*bk
        jq0 = (jk * bk) // bq
        dk, dv = jax.lax.fori_loop(jq0, num_qb, body, init)
    else:
        dk, dv = jax.lax.fori_loop(0, num_qb, body, init)
    dk_ref[:] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _flash_bwd(q, k, v, key_valid, out, lse, g, *, causal: bool, bq: int,
               bk: int):
    """Pallas backward: dq per q-block, dk/dv per k-block. Inputs are the
    UNPADDED [B, H, ., D] tensors; padding mirrors the forward."""
    b, h, n, d = q.shape
    m = k.shape[2]
    pn, pm = _pad_len(n, bq), _pad_len(m, bk)
    scale = 1.0 / math.sqrt(d)

    qf = jnp.pad(q, ((0, 0), (0, 0), (0, pn), (0, 0))).reshape(b * h, n + pn, d)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, pm), (0, 0))).reshape(b * h, m + pm, d)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, pm), (0, 0))).reshape(b * h, m + pm, d)
    gf = jnp.pad(g, ((0, 0), (0, 0), (0, pn), (0, 0))).reshape(b * h, n + pn, d)
    if key_valid is None:
        key_valid = jnp.ones((b, m), bool)
    kvf = jnp.pad(key_valid.astype(jnp.int32), ((0, 0), (0, pm)))
    kvf = jnp.broadcast_to(kvf[:, None, :], (b, h, m + pm)).reshape(b * h, 1,
                                                                    m + pm)
    # delta = rowsum(dO * O) — cheap fused elementwise+reduce outside pallas
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    deltaf = jnp.pad(delta, ((0, 0), (0, 0), (0, pn))).reshape(b * h, n + pn, 1)
    lsef = jnp.pad(lse.reshape(b * h, n, 1), ((0, 0), (0, pn), (0, 0)))

    full_q = lambda bh, i: (bh, 0, 0)
    blk_q = lambda bh, i: (bh, i, 0)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, bk=bk, causal=causal, scale=scale),
        grid=(b * h, (n + pn) // bq),
        in_specs=[
            pl.BlockSpec((None, bq, d), blk_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m + pm, d), full_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m + pm, d), full_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, d), blk_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, 1), blk_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, 1), blk_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, m + pm), full_q, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, bq, d), blk_q, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n + pn, d), q.dtype),
        interpret=_interpret(),
    )(qf, kf, vf, gf, lsef, deltaf, kvf)

    blk_k = lambda bh, j: (bh, j, 0)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, bq=bq, causal=causal, scale=scale),
        grid=(b * h, (m + pm) // bk),
        in_specs=[
            pl.BlockSpec((None, n + pn, d), full_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bk, d), blk_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bk, d), blk_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n + pn, d), full_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n + pn, 1), full_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n + pn, 1), full_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, bk),
                         lambda bh, j: (bh, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, bk, d), blk_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bk, d), blk_k, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, m + pm, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, m + pm, d), v.dtype),
        ),
        interpret=_interpret(),
    )(qf, kf, vf, gf, lsef, deltaf, kvf)

    dq = dq.reshape(b, h, n + pn, d)[:, :, :n]
    dk = dk.reshape(b, h, m + pm, d)[:, :, :m]
    dv = dv.reshape(b, h, m + pm, d)[:, :, :m]
    return dq, dk, dv


def _pad_len(n, block):
    return (-n) % block


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, causal: bool = False, bq: int = DEFAULT_BQ,
                    bk: int = DEFAULT_BK, key_valid=None):
    """q: [B, H, N, D]; k, v: [B, H, M, D]; key_valid: [B, M] bool or None.
    Causal semantics assume the query block is the *tail* of the key timeline
    (N == M, standard self-attention) — padding is handled internally."""
    return _flash_attention_impl(q, k, v, causal, bq, bk, key_valid)


def _flash_attention_impl(q, k, v, causal, bq, bk, key_valid,
                          return_lse: bool = False):
    b, h, n, d = q.shape
    m = k.shape[2]
    # the kernel's causal mask aligns timeline STARTS (q_offset=0) while the
    # reference mask aligns ENDS; both agree only for self-attention
    assert not causal or n == m, "causal flash requires N == M self-attention"
    pn, pm = _pad_len(n, bq), _pad_len(m, bk)
    if key_valid is None:
        key_valid = jnp.ones((b, m), bool)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pn), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pm), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pm), (0, 0)))
    kv = jnp.pad(key_valid, ((0, 0), (0, pm)))
    out, lse = _flash_fwd(qp, kp, vp, kv, causal=causal, bq=bq, bk=bk,
                          q_offset=0)
    out = out[:, :, :n]
    if return_lse:
        return out, lse.reshape(b, h, n + pn)[:, :, :n]
    return out


def _flash_vjp_fwd(q, k, v, causal, bq, bk, key_valid):
    out, lse = _flash_attention_impl(q, k, v, causal, bq, bk, key_valid,
                                     return_lse=True)
    return out, (q, k, v, key_valid, out, lse)


def _flash_vjp_bwd(causal, bq, bk, res, g):
    q, k, v, key_valid, out, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, key_valid, out, lse, g, causal=causal,
                            bq=bq, bk=bk)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


# ---------------------------------------------------------------------------
# SAM decomposed rel-pos flash attention
# ---------------------------------------------------------------------------

def _sam_fwd_kernel(q_ref, k_ref, v_ref, relh_ref, relw_ref, o_ref, lse_ref, *,
                    bk: int, kw: int, gh: int, scale: float, m_valid: int):
    """q_ref: [bq, D]; k/v: [M, D]; relh_ref: [bq, GH] (full-width per-q
    projections onto the GH key-grid rows); relw_ref: [bq, KW]. Key index kk
    maps to grid cell (kk//kw, kk%kw); bias[qq, kk] = rel_h[qq, kk//kw]
    + rel_w[qq, kk%kw]. bk % kw == 0.

    The [bq, bk] bias tile is built with two expansion matmuls (rh @ E_r +
    rw @ E_w); E_r for key block jk selects that block's grid rows and is
    built from iotas in-register — rel_h needs no key-block-major relayout
    in HBM (whose 16 B rows dominated this kernel's DMA time)."""
    bq, d = q_ref.shape
    m_tot = k_ref.shape[0]

    # ALL matmuls run in the input dtype (bf16 in production) with fp32
    # accumulation — fp32 MXU throughput is ~6x below bf16 on v5e. This
    # matters doubly for the rel-h expansion dot: at bq=256/bk=512/GH=64 its
    # [bq,GH]@[GH,bk] is ~80% of the QK dot's FLOPs, so running it fp32 made
    # the bias more expensive than attention itself. The expansion matrices
    # are exact 0/1 indicators and relh/relw are bf16 inputs already, so
    # bf16 dots with fp32 accumulate lose nothing. Softmax statistics stay
    # fp32, matching the windowed kernel's numerics (_win_fwd_kernel).
    q = q_ref[:] * jnp.asarray(scale, q_ref.dtype)
    relw = relw_ref[:]
    relh = relh_ref[:]                                        # [bq, GH]

    colw = jax.lax.broadcasted_iota(jnp.int32, (kw, bk), 1)
    roww = jax.lax.broadcasted_iota(jnp.int32, (kw, bk), 0)
    e_w = (colw % kw == roww).astype(relw.dtype)              # [kw, bk]
    bias_w = jax.lax.dot_general(relw, e_w, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rsel = jax.lax.broadcasted_iota(jnp.int32, (gh, bk), 0)
    ksel0 = jax.lax.broadcasted_iota(jnp.int32, (gh, bk), 1)

    def body(jk, carry):
        m_i, l_i, acc = carry
        k = k_ref[pl.ds(jk * bk, bk), :]
        v = v_ref[pl.ds(jk * bk, bk), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        e_r = (rsel == (jk * bk + ksel0) // kw).astype(relh.dtype)  # [GH, bk]
        s = s + bias_w + jax.lax.dot_general(
            relh, e_r, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # mask key padding (m_valid keys are real). Statically skipped when
        # the key timeline has no padding (production 64x64 grid with
        # bk=512): the iota+compare+select cost ~1/3 of this VPU-bound
        # kernel's per-logit work.
        if m_valid < m_tot:
            k_pos = jk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(k_pos < m_valid, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    init = (jnp.full((bq, 1), NEG_INF, jnp.float32),
            jnp.zeros((bq, 1), jnp.float32),
            jnp.zeros((bq, d), jnp.float32))
    m_i, l_i, acc = jax.lax.fori_loop(0, m_tot // bk, body, init)
    o_ref[:] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)
    lse_ref[:] = m_i + jnp.log(jnp.maximum(l_i, 1e-30))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def sam_flash_attention(q, k, v, rel_h, rel_w, grid_hw, bq: int = DEFAULT_BQ,
                        bk: int = DEFAULT_BK):
    """SAM global attention with decomposed rel-pos bias.

    q/k/v: [B, H, N, D] with N = gh*gw; rel_h: [B, H, N, gh]; rel_w:
    [B, H, N, gw] (precomputed einsums of q with the rel-pos tables —
    ops/attention.decomposed_rel_pos_bias without the final broadcast-add).
    grid_hw: static (gh, gw)."""
    return _sam_flash_impl(q, k, v, rel_h, rel_w, grid_hw, bq, bk)


def _sam_flash_impl(q, k, v, rel_h, rel_w, grid_hw, bq, bk,
                    return_lse: bool = False):
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
    assert pm % gw == 0

    # key-grid rows covered by the (row-padded) key timeline
    gh_tot = (n + pm) // gw
    qf = jnp.pad(q, ((0, 0), (0, 0), (0, pn), (0, 0))).reshape(b * h, n + pn, d)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, pm), (0, 0))).reshape(b * h, n + pm, d)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, pm), (0, 0))).reshape(b * h, n + pm, d)
    rhf = jnp.pad(rel_h, ((0, 0), (0, 0), (0, pn), (0, gh_tot - gh))
                  ).reshape(b * h, n + pn, gh_tot)
    rwf = jnp.pad(rel_w, ((0, 0), (0, 0), (0, pn), (0, 0))
                  ).reshape(b * h, n + pn, gw)

    grid = (b * h, pl.cdiv(n + pn, bq))
    out, lse = pl.pallas_call(
        functools.partial(_sam_fwd_kernel, bk=bk, kw=gw, gh=gh_tot,
                          scale=1.0 / math.sqrt(d), m_valid=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, d), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n + pm, d), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n + pm, d), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, gh_tot), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, gw), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, bq, d), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, 1), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n + pn, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n + pn, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(qf, kf, vf, rhf, rwf)
    out = out.reshape(b, h, n + pn, d)[:, :, :n]
    if return_lse:
        return out, lse.reshape(b, h, n + pn)[:, :, :n]
    return out


def _sam_dq_kernel(q_ref, k_ref, v_ref, relh_ref, relw_ref, g_ref, lse_ref,
                   delta_ref, dq_ref, drelh_ref, drelw_ref, *, bk: int,
                   kw: int, gh: int, scale: float, m_valid: int, gh_pad: int,
                   gw_pad: int):
    """dq + d_rel_h + d_rel_w for one (batch*head, q-block). The rel grads are
    q-indexed, so they accumulate alongside dq while streaming key blocks.
    d_rel_h[:, r] = sum over keys in grid row r of dlogits — a matmul with the
    {0,1} row-selector built from iotas; same for columns. relh_ref is the
    full-width [bq, GH] projection (no key-block-major relayout)."""
    bq, d = q_ref.shape
    m_tot = k_ref.shape[0]

    g = g_ref[:].astype(jnp.float32)
    lse = lse_ref[:].astype(jnp.float32)
    delta = delta_ref[:].astype(jnp.float32)
    relw = relw_ref[:].astype(jnp.float32)
    relh = relh_ref[:].astype(jnp.float32)                    # [bq, GH]

    colw = jax.lax.broadcasted_iota(jnp.int32, (kw, bk), 1)
    roww = jax.lax.broadcasted_iota(jnp.int32, (kw, bk), 0)
    e_w = (colw % kw == roww).astype(jnp.float32)             # [kw, bk]
    bias_w = jax.lax.dot_general(relw, e_w, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    # column selector padded to the d_rel_w output width
    e_w_sel = jnp.pad(e_w, ((0, gw_pad - kw), (0, 0)))        # [gw_pad, bk]
    rsel_h = jax.lax.broadcasted_iota(jnp.int32, (gh, bk), 0)
    ksel_h = jax.lax.broadcasted_iota(jnp.int32, (gh, bk), 1)

    def body(jk, carry):
        dq_acc, drh_acc, drw_acc = carry
        k_raw = k_ref[pl.ds(jk * bk, bk), :]
        k = k_raw.astype(jnp.float32)
        v = v_ref[pl.ds(jk * bk, bk), :].astype(jnp.float32)
        # same raw-dtype q*scale rounding as the forward, so p matches lse
        s = jax.lax.dot_general(
            q_ref[:] * jnp.asarray(scale, q_ref.dtype), k_raw,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        e_r = (rsel_h == (jk * bk + ksel_h) // kw).astype(jnp.float32)
        s = s + bias_w + jax.lax.dot_general(
            relh, e_r, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if m_valid < m_tot:    # statically skipped when keys are unpadded
            k_pos = jk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(k_pos < m_valid, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)                                  # [bq, bk]
        dq_new = dq_acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        # global-row selector for this key block's grid rows
        rsel = jax.lax.broadcasted_iota(jnp.int32, (gh_pad, bk), 0)
        ksel = jk * (bk // kw) + jax.lax.broadcasted_iota(
            jnp.int32, (gh_pad, bk), 1) // kw
        e_row_g = (rsel == ksel).astype(jnp.float32)           # [gh_pad, bk]
        drh_new = drh_acc + jax.lax.dot_general(
            ds, e_row_g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        drw_new = drw_acc + jax.lax.dot_general(
            ds, e_w_sel, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dq_new, drh_new, drw_new

    init = (jnp.zeros((bq, d), jnp.float32),
            jnp.zeros((bq, gh_pad), jnp.float32),
            jnp.zeros((bq, gw_pad), jnp.float32))
    dq, drh, drw = jax.lax.fori_loop(0, m_tot // bk, body, init)
    dq_ref[:] = (dq * scale).astype(dq_ref.dtype)
    drelh_ref[:] = drh.astype(drelh_ref.dtype)
    drelw_ref[:] = drw.astype(drelw_ref.dtype)


def _sam_dkv_kernel(q_ref, k_ref, v_ref, relh_ref, relw_ref, g_ref, lse_ref,
                    delta_ref, dk_ref, dv_ref, *, bq: int, kw: int, gh: int,
                    scale: float, m_valid: int, m_tot: int):
    """dk/dv for one (batch*head, k-block), streaming query blocks. relh_ref
    is the full [N_pad, GH] projection; this k-block's grid-row selector is
    built from iotas."""
    bk, d = k_ref.shape
    n_tot = q_ref.shape[0]
    jk = pl.program_id(1)

    k_raw = k_ref[:]
    v = v_ref[:].astype(jnp.float32)
    if m_valid < m_tot:    # statically skipped when keys are unpadded
        k_pos = jk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)

    rsel_h = jax.lax.broadcasted_iota(jnp.int32, (gh, bk), 0)
    ksel_h = jax.lax.broadcasted_iota(jnp.int32, (gh, bk), 1)
    e_r = (rsel_h == (jk * bk + ksel_h) // kw).astype(jnp.float32)  # [GH, bk]
    colw = jax.lax.broadcasted_iota(jnp.int32, (kw, bk), 1)
    roww = jax.lax.broadcasted_iota(jnp.int32, (kw, bk), 0)
    e_w = (colw % kw == roww).astype(jnp.float32)

    def body(jq, carry):
        dk_acc, dv_acc = carry
        q_raw = q_ref[pl.ds(jq * bq, bq), :]
        q = q_raw.astype(jnp.float32)
        g = g_ref[pl.ds(jq * bq, bq), :].astype(jnp.float32)
        lse = lse_ref[pl.ds(jq * bq, bq), :].astype(jnp.float32)
        delta = delta_ref[pl.ds(jq * bq, bq), :].astype(jnp.float32)
        rh = relh_ref[pl.ds(jq * bq, bq), :].astype(jnp.float32)
        rw = relw_ref[pl.ds(jq * bq, bq), :].astype(jnp.float32)
        # same raw-dtype q*scale rounding as the forward, so p matches lse
        s = jax.lax.dot_general(
            q_raw * jnp.asarray(scale, q_raw.dtype), k_raw,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(rw, e_w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(rh, e_r, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        if m_valid < m_tot:
            s = jnp.where(k_pos < m_valid, s, NEG_INF)
        p = jnp.exp(s - lse)
        dv_new = dv_acc + jax.lax.dot_general(
            p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_new = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dk_new, dv_new

    init = (jnp.zeros((bk, d), jnp.float32), jnp.zeros((bk, d), jnp.float32))
    dk, dv = jax.lax.fori_loop(0, n_tot // bq, body, init)
    dk_ref[:] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _sam_flash_bwd(q, k, v, rel_h, rel_w, out, lse, g, grid_hw, bq, bk):
    b, h, n, d = q.shape
    gh, gw = grid_hw
    bk = (bk // gw) * gw if bk >= gw else gw
    bk = min(bk, ((n + gw - 1) // gw) * gw)
    bq = min(bq, ((n + 127) // 128) * 128)
    pn = _pad_len(n, bq)
    pm = _pad_len(n, bk)
    gh_tot = (n + pm) // gw
    gh_pad = ((gh + 127) // 128) * 128
    gw_pad = ((gw + 127) // 128) * 128
    scale = 1.0 / math.sqrt(d)

    qf = jnp.pad(q, ((0, 0), (0, 0), (0, pn), (0, 0))).reshape(b * h, n + pn, d)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, pm), (0, 0))).reshape(b * h, n + pm, d)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, pm), (0, 0))).reshape(b * h, n + pm, d)
    gf = jnp.pad(g, ((0, 0), (0, 0), (0, pn), (0, 0))).reshape(b * h, n + pn, d)
    rhf = jnp.pad(rel_h, ((0, 0), (0, 0), (0, pn), (0, gh_tot - gh))
                  ).reshape(b * h, n + pn, gh_tot)
    rwf = jnp.pad(rel_w, ((0, 0), (0, 0), (0, pn), (0, 0))
                  ).reshape(b * h, n + pn, gw)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    deltaf = jnp.pad(delta, ((0, 0), (0, 0), (0, pn))).reshape(b * h, n + pn, 1)
    lsef = jnp.pad(lse.reshape(b * h, n, 1), ((0, 0), (0, pn), (0, 0)))

    blk_q = lambda bh, i: (bh, i, 0)
    full = lambda bh, i: (bh, 0, 0)

    dq, drh_p, drw_p = pl.pallas_call(
        functools.partial(_sam_dq_kernel, bk=bk, kw=gw, gh=gh_tot, scale=scale,
                          m_valid=n, gh_pad=gh_pad, gw_pad=gw_pad),
        grid=(b * h, (n + pn) // bq),
        in_specs=[
            pl.BlockSpec((None, bq, d), blk_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n + pm, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n + pm, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, gh_tot), blk_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, gw), blk_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, d), blk_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, 1), blk_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, 1), blk_q, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, bq, d), blk_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, gh_pad), blk_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, gw_pad), blk_q, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n + pn, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n + pn, gh_pad), rel_h.dtype),
            jax.ShapeDtypeStruct((b * h, n + pn, gw_pad), rel_w.dtype),
        ),
        interpret=_interpret(),
    )(qf, kf, vf, rhf, rwf, gf, lsef, deltaf)

    blk_k = lambda bh, j: (bh, j, 0)
    dk, dv = pl.pallas_call(
        functools.partial(_sam_dkv_kernel, bq=bq, kw=gw, gh=gh_tot,
                          scale=scale, m_valid=n, m_tot=n + pm),
        grid=(b * h, (n + pm) // bk),
        in_specs=[
            pl.BlockSpec((None, n + pn, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bk, d), blk_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bk, d), blk_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n + pn, gh_tot), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n + pn, gw), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n + pn, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n + pn, 1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n + pn, 1), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, bk, d), blk_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bk, d), blk_k, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n + pm, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, n + pm, d), v.dtype),
        ),
        interpret=_interpret(),
    )(qf, kf, vf, rhf, rwf, gf, lsef, deltaf)

    dq = dq.reshape(b, h, n + pn, d)[:, :, :n]
    dk = dk.reshape(b, h, n + pm, d)[:, :, :n]
    dv = dv.reshape(b, h, n + pm, d)[:, :, :n]
    drh = drh_p.reshape(b, h, n + pn, gh_pad)[:, :, :n, :gh]
    drw = drw_p.reshape(b, h, n + pn, gw_pad)[:, :, :n, :gw]
    return dq, dk, dv, drh, drw


def _sam_vjp_fwd(q, k, v, rel_h, rel_w, grid_hw, bq, bk):
    out, lse = _sam_flash_impl(q, k, v, rel_h, rel_w, grid_hw, bq, bk,
                               return_lse=True)
    return out, (q, k, v, rel_h, rel_w, out, lse)


def _sam_vjp_bwd(grid_hw, bq, bk, res, g):
    q, k, v, rel_h, rel_w, out, lse = res
    return _sam_flash_bwd(q, k, v, rel_h, rel_w, out, lse, g, grid_hw, bq, bk)


sam_flash_attention.defvjp(_sam_vjp_fwd, _sam_vjp_bwd)


# ---------------------------------------------------------------------------
# SAM windowed attention (the 28 window-14 layers of ViT-H)
# ---------------------------------------------------------------------------
#
# The einsum path materializes [B*nW, H, T, T] logits+bias in HBM per layer
# (T=196): ~500 MB/layer at batch 8 fp32 — pure bandwidth burn. Here each
# program computes whole-window attention for a GROUP of window-heads entirely
# in VMEM: window tokens are tiny (196), so there is no streaming; the shared
# rel-pos bias tile is built from two expansion matmuls. Mirrors
# image_encoder.py:321-392 semantics exactly (zero-padded window tokens are
# attended, as in the reference's window_partition).

WINDOW_GROUP = 8


def _win_expansions(ws: int, t: int):
    col = jax.lax.broadcasted_iota(jnp.int32, (ws, t), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (ws, t), 0)
    e_r = (col // ws == row).astype(jnp.float32)              # [ws, T]
    e_w = (col % ws == row).astype(jnp.float32)               # [ws, T]
    return e_r, e_w


def _win_bias(relh, relw, e_r, e_w, wg, t, ws):
    rh2 = relh.reshape(wg * t, ws).astype(jnp.float32)
    rw2 = relw.reshape(wg * t, ws).astype(jnp.float32)
    bias = jax.lax.dot_general(rh2, e_r, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    bias = bias + jax.lax.dot_general(rw2, e_w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    return bias.reshape(wg, t, t)


def _win_fwd_kernel(q_ref, k_ref, v_ref, relh_ref, relw_ref, o_ref, lse_ref,
                    *, ws: int, scale: float):
    """Matmuls run in the input dtype (bf16 in production) with fp32
    accumulation; softmax statistics are fp32 — matching the fast einsum
    path's numerics at a fraction of its HBM traffic."""
    wg, t, d = q_ref.shape
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    e_r, e_w = _win_expansions(ws, t)
    s = jax.lax.dot_general(q * jnp.asarray(scale, q.dtype), k,
                            (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)   # [WG, T, T]
    s = s + _win_bias(relh_ref[:], relw_ref[:], e_r, e_w, wg, t, ws)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[:] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[:] = m + jnp.log(jnp.maximum(l, 1e-30))


def _win_bwd_kernel(q_ref, k_ref, v_ref, relh_ref, relw_ref, g_ref, lse_ref,
                    delta_ref, dq_ref, dk_ref, dv_ref, drh_ref, drw_ref, *,
                    ws: int, scale: float, ws_pad: int):
    wg, t, d = q_ref.shape
    q_raw = q_ref[:]
    k_raw = k_ref[:]
    q = q_raw.astype(jnp.float32)
    k = k_raw.astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    lse = lse_ref[:].astype(jnp.float32)
    delta = delta_ref[:].astype(jnp.float32)
    e_r, e_w = _win_expansions(ws, t)
    # recompute s EXACTLY as the forward did (q*scale rounded to the input
    # dtype before the dot) so p = exp(s - lse) is consistent with the
    # stored logsumexp in bf16 training
    s = jax.lax.dot_general(q_raw * jnp.asarray(scale, q_raw.dtype), k_raw,
                            (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s + _win_bias(relh_ref[:], relw_ref[:], e_r, e_w, wg, t, ws)
    p = jnp.exp(s - lse)
    dv = jax.lax.dot_general(p, g, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)                                       # [WG, T, T]
    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds2 = ds.reshape(wg * t, t)
    drh = jax.lax.dot_general(ds2, e_r, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    drw = jax.lax.dot_general(ds2, e_w, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dq_ref[:] = (dq * scale).astype(dq_ref.dtype)
    dk_ref[:] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)
    drh_ref[:] = jnp.pad(drh.reshape(wg, t, ws),
                         ((0, 0), (0, 0), (0, ws_pad - ws))
                         ).astype(drh_ref.dtype)
    drw_ref[:] = jnp.pad(drw.reshape(wg, t, ws),
                         ((0, 0), (0, 0), (0, ws_pad - ws))
                         ).astype(drw_ref.dtype)


def _win_group(bwh: int) -> int:
    wg = WINDOW_GROUP
    while bwh % wg:
        wg //= 2
    return max(wg, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def sam_window_attention(q, k, v, rel_h, rel_w, window: int):
    """Fused windowed attention with decomposed rel-pos bias.

    q/k/v: [BW, H, T, D] with BW = batch*num_windows, T = window²;
    rel_h/rel_w: [BW, H, T, window] per-axis rel-pos projections.
    Exact reference semantics (zero-padded window tokens are attended)."""
    out, _ = _win_impl(q, k, v, rel_h, rel_w, window)
    return out


def _win_impl(q, k, v, rel_h, rel_w, window):
    bw, h, t, d = q.shape
    assert t == window * window
    bwh = bw * h
    wg = _win_group(bwh)
    shaped = lambda x, last: x.reshape(bwh, t, last)
    qf, kf, vf = (shaped(x, d) for x in (q, k, v))
    rhf = shaped(rel_h, window)
    rwf = shaped(rel_w, window)
    blk = lambda i: (i, 0, 0)
    out, lse = pl.pallas_call(
        functools.partial(_win_fwd_kernel, ws=window,
                          scale=1.0 / math.sqrt(d)),
        grid=(bwh // wg,),
        in_specs=[
            pl.BlockSpec((wg, t, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((wg, t, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((wg, t, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((wg, t, window), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((wg, t, window), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((wg, t, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((wg, t, 1), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bwh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bwh, t, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(qf, kf, vf, rhf, rwf)
    return out.reshape(bw, h, t, d), lse


def _win_vjp_fwd(q, k, v, rel_h, rel_w, window):
    out, lse = _win_impl(q, k, v, rel_h, rel_w, window)
    return out, (q, k, v, rel_h, rel_w, out, lse)


def _win_vjp_bwd(window, res, g):
    q, k, v, rel_h, rel_w, out, lse = res
    bw, h, t, d = q.shape
    bwh = bw * h
    wg = _win_group(bwh)
    ws_pad = ((window + 127) // 128) * 128
    shaped = lambda x, last: x.reshape(bwh, t, last)
    qf, kf, vf, gf = (shaped(x, d) for x in (q, k, v, g))
    rhf = shaped(rel_h, window)
    rwf = shaped(rel_w, window)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).reshape(bwh, t, 1)
    blk = lambda i: (i, 0, 0)
    dq, dk, dv, drh_p, drw_p = pl.pallas_call(
        functools.partial(_win_bwd_kernel, ws=window,
                          scale=1.0 / math.sqrt(d), ws_pad=ws_pad),
        grid=(bwh // wg,),
        in_specs=[pl.BlockSpec((wg, t, last), blk, memory_space=pltpu.VMEM)
                  for last in (d, d, d, window, window, d, 1, 1)],
        out_specs=tuple(
            pl.BlockSpec((wg, t, last), blk, memory_space=pltpu.VMEM)
            for last in (d, d, d, ws_pad, ws_pad)),
        out_shape=(
            jax.ShapeDtypeStruct((bwh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bwh, t, d), k.dtype),
            jax.ShapeDtypeStruct((bwh, t, d), v.dtype),
            jax.ShapeDtypeStruct((bwh, t, ws_pad), rel_h.dtype),
            jax.ShapeDtypeStruct((bwh, t, ws_pad), rel_w.dtype),
        ),
        interpret=_interpret(),
    )(qf, kf, vf, rhf, rwf, gf, lse, delta)
    unshape = lambda x, last: x.reshape(bw, h, t, last)
    return (unshape(dq, d), unshape(dk, d), unshape(dv, d),
            unshape(drh_p[..., :window], window),
            unshape(drw_p[..., :window], window))


sam_window_attention.defvjp(_win_vjp_fwd, _win_vjp_bwd)


# ---------------------------------------------------------------------------
# Packed-layout windowed attention (production path)
# ---------------------------------------------------------------------------
#
# Same math as sam_window_attention, different data layout: the kernel consumes
# the qkv projection UNSPLIT ([BW, T, 3*H*D]) and the rel-pos projections
# packed per head ([BW, T, 2*H*ws]), and emits merged heads ([BW, T, H*D]).
# Head extraction happens in VMEM via lane slices. This removes the
# split_heads/merge_heads HBM transposes around the kernel (~8 ms/block at
# batch 16 on v5e) that dominated the split-layout path, and the tiny-row
# (160 B / 28 B) DMAs of the per-head operands.

WINDOW_PACKED_GROUP = 1


def _win_packed_fwd_kernel(qkv_ref, rel_ref, o_ref, lse_ref, *, h: int,
                           d: int, ws: int, scale: float):
    wg, t, _ = qkv_ref.shape
    c = h * d
    e_r, e_w = _win_expansions(ws, t)
    for hh in range(h):
        q = qkv_ref[:, :, hh * d:(hh + 1) * d]
        k = qkv_ref[:, :, c + hh * d:c + (hh + 1) * d]
        v = qkv_ref[:, :, 2 * c + hh * d:2 * c + (hh + 1) * d]
        rh = rel_ref[:, :, hh * ws:(hh + 1) * ws]
        rw = rel_ref[:, :, (h + hh) * ws:(h + hh + 1) * ws]
        s = jax.lax.dot_general(q * jnp.asarray(scale, q.dtype), k,
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s + _win_bias(rh, rw, e_r, e_w, wg, t, ws)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[:, :, hh * d:(hh + 1) * d] = (o / jnp.maximum(l, 1e-30)
                                            ).astype(o_ref.dtype)
        lse_ref[:, :, hh:hh + 1] = m + jnp.log(jnp.maximum(l, 1e-30))


def _win_packed_bwd_kernel(qkv_ref, rel_ref, g_ref, lse_ref, delta_ref,
                           dqkv_ref, drel_ref, *, h: int, d: int, ws: int,
                           scale: float):
    wg, t, _ = qkv_ref.shape
    c = h * d
    e_r, e_w = _win_expansions(ws, t)
    for hh in range(h):
        q_raw = qkv_ref[:, :, hh * d:(hh + 1) * d]
        k_raw = qkv_ref[:, :, c + hh * d:c + (hh + 1) * d]
        q = q_raw.astype(jnp.float32)
        k = k_raw.astype(jnp.float32)
        v = qkv_ref[:, :, 2 * c + hh * d:2 * c + (hh + 1) * d].astype(jnp.float32)
        rh = rel_ref[:, :, hh * ws:(hh + 1) * ws]
        rw = rel_ref[:, :, (h + hh) * ws:(h + hh + 1) * ws]
        g = g_ref[:, :, hh * d:(hh + 1) * d].astype(jnp.float32)
        lse = lse_ref[:, :, hh:hh + 1].astype(jnp.float32)
        delta = delta_ref[:, :, hh:hh + 1].astype(jnp.float32)
        # same q*scale rounding as the forward — see _win_bwd_kernel note
        s = jax.lax.dot_general(q_raw * jnp.asarray(scale, q_raw.dtype), k_raw,
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s + _win_bias(rh, rw, e_r, e_w, wg, t, ws)
        p = jnp.exp(s - lse)
        dv = jax.lax.dot_general(p, g, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)                                   # [WG, T, T]
        dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds2 = ds.reshape(wg * t, t)
        drh = jax.lax.dot_general(ds2, e_r, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        drw = jax.lax.dot_general(ds2, e_w, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dqkv_ref[:, :, hh * d:(hh + 1) * d] = (dq * scale).astype(dqkv_ref.dtype)
        dqkv_ref[:, :, c + hh * d:c + (hh + 1) * d] = \
            (dk * scale).astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * c + hh * d:2 * c + (hh + 1) * d] = \
            dv.astype(dqkv_ref.dtype)
        drel_ref[:, :, hh * ws:(hh + 1) * ws] = \
            drh.reshape(wg, t, ws).astype(drel_ref.dtype)
        drel_ref[:, :, (h + hh) * ws:(h + hh + 1) * ws] = \
            drw.reshape(wg, t, ws).astype(drel_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sam_window_attention_packed(qkv, rel, num_heads: int, head_dim: int,
                                window: int):
    """Fused windowed attention over the packed layout.

    qkv: [BW, T, 3*H*D] — the qkv projection of windowed tokens, unsplit
    (BW = batch*num_windows, T = window²); rel: [BW, T, 2*H*window] with
    lanes [h*ws:(h+1)*ws] = rel_h of head h and [(H+h)*ws:...] = rel_w.
    Returns merged-head output [BW, T, H*D]. Identical numerics to
    sam_window_attention (image_encoder.py:321-392 semantics); the layout
    avoids split/merge-head HBM transposes entirely."""
    out, _ = _win_packed_impl(qkv, rel, num_heads, head_dim, window)
    return out


def _win_packed_impl(qkv, rel, h, d, ws):
    bw, t, _ = qkv.shape
    assert t == ws * ws and qkv.shape[-1] == 3 * h * d
    wg = WINDOW_PACKED_GROUP
    while bw % wg:
        wg //= 2
    blk = lambda i: (i, 0, 0)
    out, lse = pl.pallas_call(
        functools.partial(_win_packed_fwd_kernel, h=h, d=d, ws=ws,
                          scale=1.0 / math.sqrt(d)),
        grid=(bw // wg,),
        in_specs=[
            pl.BlockSpec((wg, t, 3 * h * d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((wg, t, 2 * h * ws), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((wg, t, h * d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((wg, t, h), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bw, t, h * d), qkv.dtype),
            jax.ShapeDtypeStruct((bw, t, h), jnp.float32),
        ),
        interpret=_interpret(),
    )(qkv, rel)
    return out, lse


def _win_packed_vjp_fwd(qkv, rel, h, d, ws):
    out, lse = _win_packed_impl(qkv, rel, h, d, ws)
    return out, (qkv, rel, out, lse)


def _win_packed_vjp_bwd(h, d, ws, res, g):
    qkv, rel, out, lse = res
    bw, t, _ = qkv.shape
    wg = WINDOW_PACKED_GROUP
    while bw % wg:
        wg //= 2
    # delta[b, t, h] = rowsum over D of dO_h * O_h
    delta = jnp.sum((g.astype(jnp.float32) * out.astype(jnp.float32)
                     ).reshape(bw, t, h, d), axis=-1)
    blk = lambda i: (i, 0, 0)
    dqkv, drel = pl.pallas_call(
        functools.partial(_win_packed_bwd_kernel, h=h, d=d, ws=ws,
                          scale=1.0 / math.sqrt(d)),
        grid=(bw // wg,),
        in_specs=[
            pl.BlockSpec((wg, t, 3 * h * d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((wg, t, 2 * h * ws), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((wg, t, h * d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((wg, t, h), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((wg, t, h), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((wg, t, 3 * h * d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((wg, t, 2 * h * ws), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bw, t, 3 * h * d), qkv.dtype),
            jax.ShapeDtypeStruct((bw, t, 2 * h * ws), rel.dtype),
        ),
        interpret=_interpret(),
    )(qkv, rel, g, lse, delta)
    return dqkv, drel


sam_window_attention_packed.defvjp(_win_packed_vjp_fwd, _win_packed_vjp_bwd)


# ---------------------------------------------------------------------------
# Fused decode attention (single-token query over a flat KV cache)
# ---------------------------------------------------------------------------
#
# Greedy decode reads the whole KV cache every step; with the [B, Hkv, L, D]
# layout those reads are 256 B rows (~500 GB/s effective on v5e — ~60% of
# what the chip can stream). This kernel consumes a FLAT cache layout
# [B, L, Hkv*D] (4-8 KB contiguous rows), extracts heads via 128-aligned
# lane slices in VMEM (head_dim is 128 for every supported LLM), and keeps
# an online softmax across length blocks in scratch. One program chain per
# batch row; grid = (B, L/block).
#
# MEASURED VERDICT (v5e, 2026-08): the kernel's DMA wins (~2.7 ms/step at
# 7B-batch-8) are cancelled by ~80 us of per-pallas-call launch overhead
# times num_layers calls per step — net SLOWER than XLA's heads-layout
# attention (17.4 vs 14.8 ms/step at 7B int8; 6.2 vs 4.9 at 1B bf16).
# Kept as an opt-in (LLMConfig.fused_decode) for platforms with cheaper
# custom-call dispatch; do not enable on tunneled v5e.

# Length-block size for the decode attention kernels. Callers round their
# cache allocation up to a multiple of this (runtime/generate.py), so the
# env override is an ablation knob: smaller blocks tighten valid_len
# early-exit granularity, larger blocks lengthen each DMA.
DECODE_BLOCK = int(os.environ.get("WALKGPT_DECODE_BLOCK", "256"))

# Default for decode_attention_q's int8 scores dot (see
# _decode_attn_q8_kernel): q is quantized per head to int8 outside the
# kernel and the scores dot runs int8 x int8 -> int32 on the MXU.
# Measured v5e win (7B batch 32, int4x weights, int4_flat KV, 2026-08-18):
# 19.57 vs 20.87 ms/step. Opt out with WALKGPT_QDOT8=0.
DECODE_QDOT8 = os.environ.get("WALKGPT_QDOT8", "1") == "1"

# Default for the int8 PV dot (softmax rows quantized per kv column and
# dotted int8 x int8 straight over the int8 cache values — no v cast).
DECODE_PVDOT8 = os.environ.get("WALKGPT_PVDOT8", "0") == "1"


def _decode_attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_s, l_s, acc_s,
                        *, h: int, n_kv: int, d: int, scale: float):
    jk = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(jk == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    k = k_ref[:]                                   # [bl, n_kv*d]
    v = v_ref[:]
    valid = mask_ref[:]                            # [1, bl] int32
    n_rep = h // n_kv
    for hh in range(h):
        kv_h = hh // n_rep
        q_h = q_ref[:, hh * d:(hh + 1) * d].astype(jnp.float32)   # [1, d]
        k_h = k[:, kv_h * d:(kv_h + 1) * d]
        s = jax.lax.dot_general(q_h * scale, k_h, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [1, bl]
        s = jnp.where(valid != 0, s, NEG_INF)
        m_old = m_s[hh:hh + 1, 0:1]
        l_old = l_s[hh:hh + 1, 0:1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        # exp(NEG_INF - NEG_INF) = 1 when a whole block is masked — zero the
        # invalid lanes so a fully-masked leading block cannot pollute acc/l
        p = jnp.where(valid != 0, jnp.exp(s - m_new), 0.0)
        v_h = v[:, kv_h * d:(kv_h + 1) * d]
        pv = jax.lax.dot_general(p.astype(v_h.dtype), v_h,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [1, d]
        acc_s[hh:hh + 1, :] = acc_s[hh:hh + 1, :] * alpha + pv
        m_s[hh:hh + 1, 0:1] = m_new
        l_s[hh:hh + 1, 0:1] = l_old * alpha + jnp.sum(p, axis=1, keepdims=True)

    @pl.when(jk == nb - 1)
    def _finish():
        for hh in range(h):
            o_ref[:, hh * d:(hh + 1) * d] = (
                acc_s[hh:hh + 1, :] /
                jnp.maximum(l_s[hh:hh + 1, 0:1], 1e-30)).astype(o_ref.dtype)


def decode_attention(q, k_cache, v_cache, key_mask, *, n_kv: int,
                     layer: int = 0, block: int = DECODE_BLOCK):
    """One decode step of attention over a flat cache.

    q: [B, H*D] (this step's query, all heads); k_cache/v_cache: the FULL
    [layers, B, L, n_kv*D] cache buffers with L % block == 0 (callers round
    the cache length up — masked positions are free); `layer` (static)
    selects the layer via the block index map — slicing the cache before the
    call would materialize a copy of the slice as the custom-call operand,
    which at 7B scale costs more than the attention itself.
    key_mask: [B, L] bool; must select at least one key inside the FIRST
    length-block of every row (true for any cache holding >=1 real entry at
    position 0, as greedy_generate's pos <= cache_len mask guarantees) —
    a fully-masked first block would leave the online-softmax max at -1e30
    and let exp(s - m) = 1 for masked keys pollute the accumulator.
    Returns [B, H*D]. GQA: query head hh reads kv head hh // (H/n_kv)."""
    b, hd = q.shape
    l = k_cache.shape[2]
    kd = k_cache.shape[3]
    d = kd // n_kv
    h = hd // d
    bl = min(block, l)
    assert l % bl == 0, (l, bl)
    scale = 1.0 / math.sqrt(d)
    mask = key_mask.astype(jnp.int32)[:, None]     # [B, 1, L]
    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, h=h, n_kv=n_kv, d=d,
                          scale=scale),
        grid=(b, l // bl),
        in_specs=[
            pl.BlockSpec((None, 1, hd), lambda ib, jk: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, bl, kd),
                         lambda ib, jk: (layer, ib, jk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, bl, kd),
                         lambda ib, jk: (layer, ib, jk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, bl), lambda ib, jk: (ib, 0, jk),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, hd), lambda ib, jk: (ib, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(q[:, None], k_cache, v_cache, mask)
    return out[:, 0]


# ---------------------------------------------------------------------------
# fused decode attention over a QUANTIZED flat cache (int8 / packed int4)
# ---------------------------------------------------------------------------
# The XLA formulations of quantized-cache decode attention both lose:
#   * heads-layout int8 (llm._int8_kv_decode_attention): the convert fuses
#     into the dot but the [.., n_kv, L, D] reads stream at ~60% of peak;
#   * flat-layout int8 via a block-diagonal dot
#     (llm._flat_quant_decode_attention): XLA materializes a dequantized
#     bf16 copy of the full cache layer per step per layer — measured
#     35.4 s/batch16 at 7B (2026-08-18), 3x WORSE than heads-layout.
# This kernel reads the flat [layers, B, L, n_kv*D] int8 rows (4-8 KB,
# full HBM rate, HALF the bf16 bytes) and dequantizes in VMEM: the
# per-(token, kv-head) scales fold into the scores (k) and the softmax
# rows (v) OUTSIDE the dots, so the MXU sees plain bf16 byte/nibble
# values. "pack4" halves the bytes again: two int4 values per byte in
# GLOBAL-HALVES order (byte j = flat dims (j, j+kd/2),
# models/llm._quant_pack4_flat), so the unpacked lo/hi planes are
# contiguous lane slices and every dot splits into two half-width dots.
# Scales live in [layers, B, n_kv, L]: the [.., L, n_kv] order would
# lane-pad n_kv 32 -> 128 (4x the scale bytes) and need an in-kernel
# transpose.

def _decode_attn_q_kernel(nvb_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                          mask_ref, o_ref, m_s, l_s, acc_s,
                          *, h: int, n_kv: int, d: int, scale: float,
                          pack4: bool):
    """All-heads banded-dot formulation. A per-head loop (2 tiny dots x
    h heads x L/bl blocks x layers = ~8k dot issues per decode step at 7B)
    measured 21 ms/step of pure dot-issue latency (2026-08-18); here every
    block does O(n_rep) LARGE dots instead:

      scores:  S_r = K_blk [bl, kd] @ Q_r^T [kd, n_kv]  where Q_r is the
               BAND matrix holding query head kv*n_rep + r in lane block
               kv*D (zeros elsewhere) — one MXU op for all kv heads; the
               n_kv x FLOP redundancy is irrelevant at decode shapes.
      scales:  per-(token, kv-head) k/v scales multiply S_r / fold into
               P_r OUTSIDE the dots ([bl, n_kv] elementwise).
      pv:      Y_full = P_r^T [n_kv, bl] @ V_blk [bl, kd] (one MXU op; the
               off-band columns are computed-and-discarded), then the band
               diagonal Y_full[kv(j), j] extracts via band-mask + sublane
               reduce of the small [n_kv, kd] product.

    int4 (pack4): cache rows pack GLOBAL halves — byte j holds flat dims
    (j, j + kd/2) — so the unpacked lo/hi planes are contiguous lane
    slices [0, kd/2) / [kd/2, kd) and every dot splits into two plain
    half-width dots (no per-head interleave). Scales stay per (token,
    kv-head) and fold post-dot, so the split is layout-only."""
    jk = pl.program_id(1)
    nb = pl.num_programs(1)
    n_rep = h // n_kv
    kd = n_kv * d

    @pl.when(jk == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    # blocks at or past the valid length hold no attendable keys: the
    # index maps clamp them to the last valid block (same block index ->
    # the Mosaic pipeline skips the re-fetch DMA) and the body is skipped.
    # Early decode steps then stream only ceil(valid/bl) blocks instead of
    # the whole rounded-up cache.
    @pl.when(jk < nvb_ref[0])
    def _active():
        _decode_attn_q_block(q_ref, k_ref, ks_ref, v_ref, vs_ref, mask_ref,
                             m_s, l_s, acc_s, h=h, n_kv=n_kv, d=d,
                             scale=scale, pack4=pack4)

    @pl.when(jk == nb - 1)
    def _finish():
        _decode_attn_q_finish(o_ref, m_s, l_s, acc_s, h=h, n_kv=n_kv, d=d)


def _decode_attn_q8_kernel(nvb_ref, qb8_ref, qs_ref, k_ref, ks_ref, v_ref,
                           vs_ref, mask_ref, o_ref, m_s, l_s, acc_s,
                           *, h: int, n_kv: int, d: int, scale: float,
                           pack4: bool, pv8: bool = False):
    """int8-MXU-scores variant: the banded query matrix arrives PRE-BUILT
    and PRE-QUANTIZED (qb8_ref [n_rep, n_kv, kd] int8, per-head scales
    qs_ref [n_rep, n_kv] f32 — decode_attention_q builds them outside, one
    tiny [B, n_rep, n_kv, kd] tensor per call whose block index is constant
    in jk, so it DMAs once per batch row). The scores dot is then a native
    int8 x int8 -> int32 MXU op (2x the bf16 rate on v5e) with NO in-kernel
    k cast, and the per-head q scale folds into the existing post-dot
    scale row. q precision is unchanged vs the bf16 kernel: bf16 carries an
    8-bit mantissa, so the bf16 q_band was already ~256-level."""
    jk = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(jk == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    @pl.when(jk < nvb_ref[0])
    def _active():
        _decode_attn_q_block(None, k_ref, ks_ref, v_ref, vs_ref, mask_ref,
                             m_s, l_s, acc_s, h=h, n_kv=n_kv, d=d,
                             scale=scale, pack4=pack4,
                             qb8_ref=qb8_ref, qs_ref=qs_ref, pv8=pv8)

    @pl.when(jk == nb - 1)
    def _finish():
        _decode_attn_q_finish(o_ref, m_s, l_s, acc_s, h=h, n_kv=n_kv, d=d)


def _decode_attn_q_finish(o_ref, m_s, l_s, acc_s, *, h: int, n_kv: int,
                          d: int):
    n_rep = h // n_kv
    kd = n_kv * d
    lane_kv = jax.lax.broadcasted_iota(jnp.int32, (n_kv, kd), 1) // d
    row_kv = jax.lax.broadcasted_iota(jnp.int32, (n_kv, kd), 0)
    r_mat = (lane_kv == row_kv).astype(jnp.bfloat16)
    for r in range(n_rep):
        l_exp = jax.lax.dot_general(
            l_s[r:r + 1, :n_kv].astype(jnp.bfloat16), r_mat,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        yr = acc_s[r:r + 1, :] / jnp.maximum(l_exp, 1e-30)   # [1, kd]
        if n_rep == 1:
            o_ref[:] = yr.astype(o_ref.dtype)
        else:
            for kv in range(n_kv):
                hh = kv * n_rep + r
                o_ref[:, hh * d:(hh + 1) * d] = yr[
                    :, kv * d:(kv + 1) * d].astype(o_ref.dtype)


def _decode_attn_q_block(q_ref, k_ref, ks_ref, v_ref, vs_ref, mask_ref,
                         m_s, l_s, acc_s,
                         *, h: int, n_kv: int, d: int, scale: float,
                         pack4: bool, qb8_ref=None, qs_ref=None,
                         pv8: bool = False):
    n_rep = h // n_kv
    kd = n_kv * d
    k8 = k_ref[:]                                  # [bl, kd(/2)] int8
    v8 = v_ref[:]
    ks = ks_ref[:].astype(jnp.float32)             # [n_kv, bl]
    vs = vs_ref[:].astype(jnp.float32)
    valid = mask_ref[:]                            # [bl, 1] int32

    qdot8 = qb8_ref is not None
    if pack4:
        def unpack(z8, dtype):
            z32 = z8.astype(jnp.int32)
            lo = ((z32 << 28) >> 28).astype(dtype)
            hi = (z32 >> 4).astype(dtype)
            return lo, hi
        # k feeds the scores dot: int8 planes when the q side is int8
        # (native int8 MXU dot), bf16 otherwise. v unpacks to int8 when the
        # PV dot is int8 (pv8), bf16 otherwise.
        klo, khi = unpack(k8, jnp.int8 if qdot8 else jnp.bfloat16)
        vlo, vhi = unpack(v8, jnp.int8 if pv8 else jnp.bfloat16)

    # lane -> kv-head band helpers (static iota). Arithmetic 0/1 masks, not
    # boolean selects: Mosaic cannot relayout a [n_kv, kd] i1 vector between
    # the (8,128) compare tiling and the (16,128) bf16-select tiling
    # ("Invalid relayout ... vector<32x4096xi1>", 2026-08-18).
    lane_kv = jax.lax.broadcasted_iota(jnp.int32, (n_kv, kd), 1) // d
    row_kv = jax.lax.broadcasted_iota(jnp.int32, (n_kv, kd), 0)
    r_mat = (lane_kv == row_kv).astype(jnp.bfloat16)   # [n_kv, kd] 0/1
    band_f32 = r_mat.astype(jnp.float32)

    ks_t = ks.T                                    # [bl, n_kv]
    vs_t = vs.T

    for r in range(n_rep):
        if qdot8:
            # pre-built banded int8 q rows: scores are int8 x int8 -> int32
            # MXU dots; the per-head q scale folds into the post-dot row.
            q_band8 = qb8_ref[r]                   # [n_kv, kd] int8
            if pack4:
                s = jax.lax.dot_general(klo, q_band8[:, : kd // 2],
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                s = s + jax.lax.dot_general(khi, q_band8[:, kd // 2:],
                                            (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.int32)
            else:
                s = jax.lax.dot_general(k8, q_band8,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.int32)
            s = s.astype(jnp.float32) * (
                ks_t * (qs_ref[r:r + 1] * scale))  # [bl, n_kv]
        else:
            # bands of this pass's query heads: head kv*n_rep + r -> lane
            # block kv*D
            if n_rep == 1:
                q_band = jnp.broadcast_to(q_ref[:].astype(jnp.bfloat16),
                                          (n_kv, kd)) * r_mat
            else:
                # gather pass-r heads (kv*n_rep + r) into [n_kv, d] rows,
                # tile across the lane blocks, band-mask:
                # q_band[kv, kv*D+dd] = q[(kv*n_rep+r)*D + dd]
                qr = q_ref[0].reshape(h, d)[r::n_rep].astype(jnp.bfloat16)
                q_band = jnp.concatenate([qr] * n_kv, axis=1) * r_mat
            if pack4:
                s = jax.lax.dot_general(klo, q_band[:, : kd // 2],
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = s + jax.lax.dot_general(khi, q_band[:, kd // 2:],
                                            (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.float32)
            else:
                s = jax.lax.dot_general(k8.astype(jnp.bfloat16), q_band,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            s = s * (ks_t * scale)                 # [bl, n_kv]
        s = jnp.where(valid != 0, s, NEG_INF)
        m_old = m_s[r:r + 1, :n_kv]                # [1, n_kv]
        l_old = l_s[r:r + 1, :n_kv]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=0, keepdims=True))
        alpha = jnp.exp(m_old - m_new)             # [1, n_kv]
        p = jnp.where(valid != 0, jnp.exp(s - m_new), 0.0)   # [bl, n_kv]
        l_s[r:r + 1, :n_kv] = l_old * alpha + jnp.sum(p, axis=0,
                                                      keepdims=True)
        m_s[r:r + 1, :n_kv] = m_new
        if pv8:
            # int8 PV: quantize the scaled softmax rows per kv COLUMN
            # (p >= 0, vs > 0 -> nonnegative), dot int8 x int8 -> int32
            # straight over the int8 cache values (no v cast), and expand
            # the per-column scale to lanes with the band matrix — the
            # band reduce only mixes lanes of the SAME kv row, so the
            # post-reduce scaling is exact.
            pf = p * vs_t                           # [bl, n_kv] f32
            psc = jnp.maximum(jnp.max(pf, axis=0, keepdims=True),
                              1e-20) * (1.0 / 127.0)          # [1, n_kv]
            ps8 = jnp.round(pf / psc).astype(jnp.int8)
            if pack4:
                y_i = jnp.concatenate([
                    jax.lax.dot_general(ps8, vlo, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32),
                    jax.lax.dot_general(ps8, vhi, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)],
                    axis=1)                         # [n_kv, kd]
            else:
                y_i = jax.lax.dot_general(
                    ps8, v8, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            y = jnp.sum(y_i.astype(jnp.float32) * band_f32, 0,
                        keepdims=True)              # [1, kd]
            y = y * jax.lax.dot_general(
                psc, band_f32, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            p_s = (p * vs_t).astype(jnp.bfloat16)
            if pack4:
                y_full = jnp.concatenate([
                    jax.lax.dot_general(p_s, vlo, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32),
                    jax.lax.dot_general(p_s, vhi, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)],
                    axis=1)                         # [n_kv, kd]
            else:
                y_full = jax.lax.dot_general(
                    p_s, v8.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            y = jnp.sum(y_full * band_f32, 0, keepdims=True)         # [1, kd]
        alpha_exp = jax.lax.dot_general(
            alpha.astype(jnp.bfloat16), r_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # [1, kd]
        acc_s[r:r + 1, :] = acc_s[r:r + 1, :] * alpha_exp + y


def _decode_attn_qc_kernel(cl_ref, q_ref, qs_ref, k_ref, ks_ref, v_ref,
                           vs_ref, o_ref, m_s, l_s, acc_s,
                           *, h: int, n_kv: int, d: int, tc: int,
                           scale: float, pack4: bool, bl: int,
                           qdot8: bool):
    """CHUNK variant of the banded quantized decode attention: Tc query
    tokens (the speculative-verification chunk, runtime/generate.
    speculative_generate) attend the flat quantized cache in ONE pass —
    the cache blocks stream ONCE per chunk instead of once per token, which
    is the whole point of speculation on a weight/cache-read-bound decode.

    Layout: the banded query matrix grows Tc x — row t*n_kv + kv of
    q_ref[r] holds query (token t, head kv*n_rep + r) in lane block kv*D —
    so the scores dot stays ONE MXU op per (pass, block):
        S = K_blk [bl, kd] @ Q_band^T [kd, tc*n_kv]        -> [bl, tc*n_kv]
    The causal-within-chunk rule is enforced in-kernel: key slot p is valid
    for chunk token t iff p < cl + t + 1, where cl = cl_ref[ib] is the
    row's pre-chunk cache length (caches are COMPACT per row here — the
    chunk K/V were scattered at [cl, cl+tc) before the call, so there are
    no pad holes). PV runs as P^T [tc*n_kv, bl] @ V_blk [bl, kd]; the band
    diagonal per t extracts with a [tc, n_kv, kd] band-mask reduce.

    qdot8=True mirrors the single-token kernel's int8-MXU scores dot
    (_decode_attn_q8_kernel) with the SAME per-head q quantization and the
    SAME scale-fold expression — the int8 x int8 -> int32 dot is exact
    integer arithmetic, so a chunk position's scores bit-match the
    single-token kernel's for the same (position, cache): that is what
    keeps speculative decode token-identical to wave greedy under the
    production DECODE_QDOT8 default (tests/test_llm.py
    test_speculative_flat_cache_token_identical)."""
    jk = pl.program_id(1)
    nb = pl.num_programs(1)
    n_rep = h // n_kv
    kd = n_kv * d

    @pl.when(jk == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    ib = pl.program_id(0)
    cl = cl_ref[ib]
    nvb = jnp.minimum((cl + tc + bl - 1) // bl, nb)

    @pl.when(jk < nvb)
    def _active():
        k8 = k_ref[:]                              # [bl, kd(/2)] int8
        v8 = v_ref[:]
        ks = ks_ref[:].astype(jnp.float32)         # [n_kv, bl]
        vs = vs_ref[:].astype(jnp.float32)
        if pack4:
            def unpack(z8, dtype):
                z32 = z8.astype(jnp.int32)
                return (((z32 << 28) >> 28).astype(dtype),
                        (z32 >> 4).astype(dtype))
            klo, khi = unpack(k8, jnp.int8 if qdot8 else jnp.bfloat16)
            vlo, vhi = unpack(v8, jnp.bfloat16)

        # [bl, tc*n_kv] masks/scales: column j = (t = j // n_kv, kv = j % n_kv)
        pos = jk * bl + jax.lax.broadcasted_iota(jnp.int32, (bl, tc * n_kv), 0)
        col_t = jax.lax.broadcasted_iota(jnp.int32, (bl, tc * n_kv), 1) // n_kv
        valid = pos < cl + col_t + 1
        ks_tile = jnp.concatenate([ks.T] * tc, axis=1)     # [bl, tc*n_kv]
        vs_tile = jnp.concatenate([vs.T] * tc, axis=1)

        # Per-(t, kv) extraction uses the single-token kernel's OWN band
        # matrix and expressions in a static per-t loop (Mosaic cannot
        # shape-cast [1, tc*n_kv] -> [tc, n_kv], and a [tc*n_kv, kd]
        # masked-product formulation blew the 16 MB scoped-vmem limit at
        # 13B — ~22 MB of f32 selector/product temporaries). Only the
        # SCORES stay one big [bl, kd] x [kd, tc*n_kv] MXU dot; PV runs
        # per t over the lane slice p_s[:, t*n_kv:(t+1)*n_kv], which is
        # line-for-line the single-token kernel's PV/band/alpha math per
        # position (the bit-match that keeps speculation token-identical
        # where kernel arithmetic is shared).
        lane_kv = jax.lax.broadcasted_iota(jnp.int32, (n_kv, kd), 1) // d
        row_kv = jax.lax.broadcasted_iota(jnp.int32, (n_kv, kd), 0)
        r_mat = (lane_kv == row_kv).astype(jnp.bfloat16)   # [n_kv, kd] 0/1
        band_f32 = r_mat.astype(jnp.float32)

        for r in range(n_rep):
            q_band = q_ref[r]                # [tc*n_kv, kd] bf16 or int8
            if qdot8:
                # exact int8 x int8 -> int32 scores + the single-token
                # kernel's scale fold: s_f32 * (ks * (qs * scale))
                if pack4:
                    s = jax.lax.dot_general(
                        klo, q_band[:, : kd // 2], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    s = s + jax.lax.dot_general(
                        khi, q_band[:, kd // 2:], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                else:
                    s = jax.lax.dot_general(
                        k8, q_band, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                s = s.astype(jnp.float32) * (
                    ks_tile * (qs_ref[r:r + 1] * scale))
            else:
                if pack4:
                    s = jax.lax.dot_general(
                        klo, q_band[:, : kd // 2], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s = s + jax.lax.dot_general(
                        khi, q_band[:, kd // 2:], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    s = jax.lax.dot_general(
                        k8.astype(jnp.bfloat16), q_band,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                s = s * (ks_tile * scale)
            s = jnp.where(valid, s, NEG_INF)
            m_old = m_s[r:r + 1]                   # [1, tc*n_kv]
            l_old = l_s[r:r + 1]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=0, keepdims=True))
            alpha = jnp.exp(m_old - m_new)
            p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
            l_s[r:r + 1] = l_old * alpha + jnp.sum(p, axis=0, keepdims=True)
            m_s[r:r + 1] = m_new
            p_s = (p * vs_tile).astype(jnp.bfloat16)       # [bl, tc*n_kv]
            v8b = None if pack4 else v8.astype(jnp.bfloat16)
            for t in range(tc):
                ps_t = p_s[:, t * n_kv:(t + 1) * n_kv]     # [bl, n_kv]
                if pack4:
                    y_full = jnp.concatenate([
                        jax.lax.dot_general(ps_t, vlo,
                                            (((0,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32),
                        jax.lax.dot_general(ps_t, vhi,
                                            (((0,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)],
                        axis=1)                            # [n_kv, kd]
                else:
                    y_full = jax.lax.dot_general(
                        ps_t, v8b, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                y = jnp.sum(y_full * band_f32, 0, keepdims=True)  # [1, kd]
                alpha_t = alpha[:, t * n_kv:(t + 1) * n_kv]
                alpha_exp = jax.lax.dot_general(
                    alpha_t.astype(jnp.bfloat16), r_mat,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # [1, kd]
                row = r * tc + t
                acc_s[row:row + 1] = acc_s[row:row + 1] * alpha_exp + y

    @pl.when(jk == nb - 1)
    def _finish():
        lane_kv = jax.lax.broadcasted_iota(jnp.int32, (n_kv, kd), 1) // d
        row_kv = jax.lax.broadcasted_iota(jnp.int32, (n_kv, kd), 0)
        r_mat = (lane_kv == row_kv).astype(jnp.bfloat16)
        for r in range(n_rep):
            for t in range(tc):
                l_t = l_s[r:r + 1, t * n_kv:(t + 1) * n_kv]  # [1, n_kv]
                l_exp = jax.lax.dot_general(
                    l_t.astype(jnp.bfloat16), r_mat,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [1, kd]
                row = r * tc + t
                yr = acc_s[row:row + 1] / jnp.maximum(l_exp, 1e-30)
                if n_rep == 1:
                    o_ref[t:t + 1, :] = yr.astype(o_ref.dtype)
                else:
                    for kv in range(n_kv):
                        hh = kv * n_rep + r
                        o_ref[t:t + 1, hh * d:(hh + 1) * d] = yr[
                            :, kv * d:(kv + 1) * d].astype(o_ref.dtype)


def banded_q_chunk(q, *, n_kv: int, head_dim: int):
    """Build the Tc-token banded bf16 query matrix for the chunk kernel:
    out[b, r, t*n_kv + kv, kv*D + dd] = q[b, t, (kv*n_rep + r)*D + dd].
    q: [B, Tc, H*D] -> [B, n_rep, Tc*n_kv, n_kv*D] bf16."""
    b, tc, hd = q.shape
    d = head_dim
    h = hd // d
    n_rep = h // n_kv
    qf = q.astype(jnp.bfloat16).reshape(b, tc, n_kv, n_rep, d)
    qf = qf.transpose(0, 3, 1, 2, 4)               # [B, n_rep, Tc, n_kv, d]
    eye = jnp.eye(n_kv, dtype=jnp.bfloat16)[None, None, None, :, :, None]
    band = (qf[:, :, :, :, None, :] * eye).reshape(
        b, n_rep, tc * n_kv, n_kv * d)
    return band


def banded_q8_chunk(q, *, n_kv: int, head_dim: int):
    """Tc-token int8 banded query + per-(token, head) scales — the SAME
    per-head quantization as banded_q8, so the chunk kernel's int8 scores
    dot bit-matches the single-token kernel's for a given position.
    q: [B, Tc, H*D] -> (int8 [B, n_rep, Tc*n_kv, n_kv*D],
                        f32 scales [B, n_rep, Tc*n_kv])."""
    b, tc, hd = q.shape
    d = head_dim
    h = hd // d
    n_rep = h // n_kv
    qf = q.astype(jnp.float32).reshape(b, tc, h, d)
    qs = jnp.maximum(jnp.max(jnp.abs(qf), -1, keepdims=True),
                     1e-20) * (1.0 / 127.0)                 # [B, Tc, h, 1]
    q8 = jnp.round(qf / qs).astype(jnp.int8)
    q8r = q8.reshape(b, tc, n_kv, n_rep, d).transpose(0, 3, 1, 2, 4)
    eye8 = jnp.eye(n_kv, dtype=jnp.int8)[None, None, None, :, :, None]
    band = (q8r[:, :, :, :, None, :] * eye8).reshape(
        b, n_rep, tc * n_kv, n_kv * d)
    qs_r = qs[..., 0].reshape(b, tc, n_kv, n_rep).transpose(0, 3, 1, 2)
    return band, qs_r.reshape(b, n_rep, tc * n_kv).astype(jnp.float32)


def decode_attention_q_chunk(q, k_cache, k_scale, v_cache, v_scale,
                             cache_len, *, n_kv: int, head_dim: int,
                             pack4: bool = False, layer: int = 0,
                             block: int = DECODE_BLOCK,
                             qdot_int8: Optional[bool] = None):
    """Tc-token chunk attention over a QUANTIZED flat cache (speculative
    verification). q: [B, Tc, H*D]; cache buffers as decode_attention_q;
    cache_len: [B] int32 pre-chunk lengths — the chunk's K/V must already
    sit at compact slots [cache_len, cache_len + Tc) per row, and caches
    must be COMPACT per row (no pad holes; llm.decode_chunk's layout).
    Causality inside the chunk (token t sees slots < cache_len + t + 1) is
    enforced in-kernel. Blocks past ceil((cache_len+Tc)/block) are skipped
    per row. Returns [B, Tc, H*D] in q.dtype."""
    b, tc, hd = q.shape
    l = k_cache.shape[2]
    d = head_dim
    h = hd // d
    kd = k_cache.shape[3]
    assert kd == n_kv * (d // 2 if pack4 else d), (kd, n_kv, d, pack4)
    bl = min(block, l)
    assert l % bl == 0, (l, bl)
    n_rep = h // n_kv
    scale = 1.0 / math.sqrt(d)
    cl = jnp.asarray(cache_len, jnp.int32)
    if qdot_int8 is None:
        qdot_int8 = DECODE_QDOT8
    if qdot_int8:
        band, qs = banded_q8_chunk(q, n_kv=n_kv, head_dim=d)
    else:
        band = banded_q_chunk(q, n_kv=n_kv, head_dim=d)
        qs = jnp.ones((b, n_rep, tc * n_kv), jnp.float32)

    def kblk(ib, jk, cl_ref):
        nvb = jnp.minimum((cl_ref[ib] + tc + bl - 1) // bl, l // bl)
        return (layer, ib, jnp.minimum(jk, nvb - 1), 0)

    def sblk(ib, jk, cl_ref):
        nvb = jnp.minimum((cl_ref[ib] + tc + bl - 1) // bl, l // bl)
        return (layer, ib, 0, jnp.minimum(jk, nvb - 1))

    out = pl.pallas_call(
        functools.partial(_decode_attn_qc_kernel, h=h, n_kv=n_kv, d=d,
                          tc=tc, scale=scale, pack4=pack4, bl=bl,
                          qdot8=qdot_int8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, l // bl),
            in_specs=[
                pl.BlockSpec((None, n_rep, tc * n_kv, n_kv * d),
                             lambda ib, jk, cl_ref: (ib, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, n_rep, tc * n_kv),
                             lambda ib, jk, cl_ref: (ib, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, bl, kd), kblk,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, n_kv, bl), sblk,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, bl, kd), kblk,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, n_kv, bl), sblk,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, tc, hd),
                                   lambda ib, jk, cl_ref: (ib, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((n_rep, tc * n_kv), jnp.float32),
                pltpu.VMEM((n_rep, tc * n_kv), jnp.float32),
                pltpu.VMEM((n_rep * tc, n_kv * d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, tc, hd), q.dtype),
        interpret=_interpret(),
    )(cl, band, qs, k_cache, k_scale, v_cache, v_scale)
    return out


def banded_q8(q, *, n_kv: int, head_dim: int):
    """Quantize q per head and pre-build the BANDED int8 query matrices for
    the int8-MXU scores dot (built OUTSIDE the kernel — their block index
    is constant in the length-block grid dim, so they DMA once per row):
    qb8[b, r, kv, kv*D+dd] = round(q[b, (kv*n_rep+r)*D+dd] / qs).
    Returns (qb8 int8 [B, n_rep, n_kv, n_kv*D], qs f32 [B, n_rep, n_kv])."""
    b, hd = q.shape
    d = head_dim
    h = hd // d
    n_rep = h // n_kv
    kd_log = n_kv * d
    qf = q.astype(jnp.float32).reshape(b, h, d)
    qs = jnp.maximum(jnp.max(jnp.abs(qf), -1, keepdims=True),
                     1e-20) * (1.0 / 127.0)                    # [b, h, 1]
    q8 = jnp.round(qf / qs).astype(jnp.int8)
    q8r = q8.reshape(b, n_kv, n_rep, d).transpose(0, 2, 1, 3)
    eye8 = jnp.eye(n_kv, dtype=jnp.int8)[None, None, :, :, None]
    qb8 = (q8r[:, :, :, None, :] * eye8).reshape(b, n_rep, n_kv, kd_log)
    qs_r = qs[..., 0].reshape(b, n_kv, n_rep).transpose(0, 2, 1)
    return qb8, qs_r.astype(jnp.float32)


def decode_attention_q(q, k_cache, k_scale, v_cache, v_scale, key_mask, *,
                       n_kv: int, head_dim: int, pack4: bool = False,
                       layer: int = 0, block: int = DECODE_BLOCK,
                       valid_len=None, qdot_int8: Optional[bool] = None,
                       pv_int8: Optional[bool] = None):
    """One decode step of attention over a QUANTIZED flat cache.

    q: [B, H*D]; k_cache/v_cache: [layers, B, L, n_kv*D] int8, or with
    pack4=True [layers, B, L, n_kv*D/2] nibble-packed int4 in GLOBAL-HALVES
    order — byte j holds flat dims (j, j + n_kv*D/2)
    (models/llm._quant_pack4_flat), so the kernel's unpacked lo/hi planes
    are contiguous lane slices;
    k_scale/v_scale: [layers, B, n_kv, L] bf16 per-(token, kv-head) scales;
    key_mask: [B, L] bool with L % block == 0 (callers round the cache up;
    masked slots are free) and at least one True inside the first block of
    every row (see decode_attention). `layer` (static) selects the cache
    layer inside the block index map — pre-slicing would materialize the
    slice as a custom-call operand copy.
    valid_len: optional traced int32 scalar — no key at or beyond it is
    valid (greedy decode: prompt_max + step + 1). Length blocks past it
    clamp to the last valid block in the index maps (the Mosaic pipeline
    skips the duplicate fetch) and their compute is skipped, so early
    steps stream only ceil(valid_len/block) blocks.
    Returns [B, H*D] in q.dtype."""
    b, hd = q.shape
    l = k_cache.shape[2]
    d = head_dim
    h = hd // d
    kd = k_cache.shape[3]
    assert kd == n_kv * (d // 2 if pack4 else d), (kd, n_kv, d, pack4)
    assert k_scale.shape[-2:] == (n_kv, l), (k_scale.shape, n_kv, l)
    bl = min(block, l)
    assert l % bl == 0, (l, bl)
    n_rep = h // n_kv
    scale = 1.0 / math.sqrt(d)
    mask = key_mask.astype(jnp.int32)[:, :, None]  # [B, L, 1] (sublane-major)
    if valid_len is None:
        nvb = jnp.full((1,), l // bl, jnp.int32)
    else:
        nvb = jnp.minimum(-(-jnp.asarray(valid_len, jnp.int32) // bl),
                          l // bl).reshape(1)

    def kblk(ib, jk, nvb_ref):
        return (layer, ib, jnp.minimum(jk, nvb_ref[0] - 1), 0)

    def sblk(ib, jk, nvb_ref):
        return (layer, ib, 0, jnp.minimum(jk, nvb_ref[0] - 1))

    if qdot_int8 is None:
        qdot_int8 = DECODE_QDOT8
    if pv_int8 is None:
        pv_int8 = DECODE_PVDOT8
    if qdot_int8:
        kd_log = n_kv * d
        qb8, qs_r = banded_q8(q, n_kv=n_kv, head_dim=d)
        first_specs = [
            pl.BlockSpec((None, n_rep, n_kv, kd_log),
                         lambda ib, jk, nvb_ref: (ib, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n_rep, n_kv),
                         lambda ib, jk, nvb_ref: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        first_args = (qb8, qs_r.astype(jnp.float32))
        kernel = _decode_attn_q8_kernel
    else:
        first_specs = [
            pl.BlockSpec((None, 1, hd),
                         lambda ib, jk, nvb_ref: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        first_args = (q[:, None],)
        kernel = _decode_attn_q_kernel

    kw = {"pv8": pv_int8} if qdot_int8 else {}
    out = pl.pallas_call(
        functools.partial(kernel, h=h, n_kv=n_kv, d=d,
                          scale=scale, pack4=pack4, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, l // bl),
            in_specs=first_specs + [
                pl.BlockSpec((None, None, bl, kd), kblk,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, n_kv, bl), sblk,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, bl, kd), kblk,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, n_kv, bl), sblk,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, bl, 1),
                             lambda ib, jk, nvb_ref:
                             (ib, jnp.minimum(jk, nvb_ref[0] - 1), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, 1, hd),
                                   lambda ib, jk, nvb_ref: (ib, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((n_rep, n_kv), jnp.float32),
                pltpu.VMEM((n_rep, n_kv), jnp.float32),
                pltpu.VMEM((n_rep, n_kv * d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), q.dtype),
        interpret=_interpret(),
    )(nvb, *first_args, k_cache, k_scale, v_cache, v_scale, mask)
    return out[:, 0]

