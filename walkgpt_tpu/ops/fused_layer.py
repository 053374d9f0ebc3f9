"""Fused decode layer tail: attention + o-proj + residual + RMSNorm + MLP
in ONE Pallas launch per layer. EXPERIMENT — measured LOSS; keep off.

Hypothesis (from the 2026-08-18 decode attribution at 7B batch 32): the
decode step's ~8 ms residual over the byte roofline is per-pallas-call
launch overhead (3 custom calls/layer x 32 layers), so folding everything
after the qkv projection + rope + cache write into ONE call per layer
should recover most of it.

MEASURED VERDICT (v5e, whole-program bench_decode 7b 32 256
int4x:int4_flat, 2026-08-18): 21.50 ms/step fused vs 19.57 unfused — the
fusion LOSES ~2 ms/step. The monolithic phased grid serializes work XLA
overlaps across kernel boundaries (next-phase weight DMA behind attention,
o/MLP dot scheduling), which outweighs the saved launches; the residual
over roofline is NOT primarily launch overhead. Kept as an opt-in
(WALKGPT_FUSED_LAYER=1) negative result with an interpret-mode parity
test; also documents two Mosaic lowering restrictions hit along the way
(no dynamic-sublane int8 vector stores, no dynamic-lane-offset stores of
packed bf16/int8 vectors — see the static unrolls below).

The kernel folds:

    att  = softmax(q K^T / sqrt(d)) V          (quantized flat cache,
                                                banded-dot formulation of
                                                flash_attention.decode_attention_q)
    x2   = x + (att8 @ o_wq) * as * o_scale    (W8A8 o projection)
    h    = rms_norm(x2) * post_scale
    y    = x2 + mlp_int4(h)                    (nibble-packed int4 MLP,
                                                tile-local down halves as in
                                                ops/int4._fused_mlp_kernel)

The 1-D grid is PHASED: steps [0, B*nb) run per-(row, length-block)
attention into a persistent [B, H] VMEM scratch; steps [B*nb, B*nb+n_o)
stream o-projection column tiles; the rest stream MLP intermediate tiles
accumulating into the output block (constant index map keeps it resident).
Inputs used by only some phases clamp their block index elsewhere, so the
Mosaic pipeline never re-fetches them.

Opt-in via WALKGPT_FUSED_LAYER=1 (models/llm.decode_step); requires the
int4x + quantized-flat-cache decode format: rope RMSNorm model, W8A8 o
projection ({"w_q","w_scale","a8"}), int4 MLP ({"w_p4"/"w_p4t"}), no
biases/LoRA on the fused projections.

Reference behavior: /root/reference/model (LLaMA decoder layer semantics);
the quantization/fusion strategy is original to this port.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import (DECODE_BLOCK, NEG_INF, _decode_attn_q_block,
                              _interpret)
from .int4 import tile_for, unpack4

FUSED_LAYER = os.environ.get("WALKGPT_FUSED_LAYER", "0") == "1"

O_TILE = 512


def _kernel(nvb_ref, qb8_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref, mask_ref,
            x_ref, ow_ref, os_ref, pn_ref, g_ref, gs_ref, u_ref, us_ref,
            d_ref, ds_ref, o_ref,
            m_s, l_s, acc_s, attf_s, att8_s, as_s, xo_s, h_s,
            *, b: int, h: int, n_kv: int, d: int, scale: float, pack4: bool,
            nb: int, n_o: int, n_mlp: int, o_tile: int, gelu: bool,
            eps: float):
    g = pl.program_id(0)
    n_rep = h // n_kv
    kd = n_kv * d
    att_phase_end = b * nb
    o_phase_end = att_phase_end + n_o

    # ---- attention phases: row r = g // nb, length block j = g % nb ----
    @pl.when(g < att_phase_end)
    def _attention():
        r = g // nb
        j = g % nb

        @pl.when(j == 0)
        def _init():
            m_s[:] = jnp.full_like(m_s, NEG_INF)
            l_s[:] = jnp.zeros_like(l_s)
            acc_s[:] = jnp.zeros_like(acc_s)

        @pl.when(j < nvb_ref[0])
        def _active():
            _decode_attn_q_block(None, k_ref, ks_ref, v_ref, vs_ref,
                                 mask_ref, m_s, l_s, acc_s, h=h, n_kv=n_kv,
                                 d=d, scale=scale, pack4=pack4,
                                 qb8_ref=qb8_ref, qs_ref=qs_ref)

        @pl.when(j == nb - 1)
        def _finish():
            # normalize + quantize this row's attention output into the
            # persistent scratches (row-dynamic sublane store). n_rep == 1
            # (MHA) is guaranteed by the launcher's kd == hidden assert.
            lane_kv = jax.lax.broadcasted_iota(jnp.int32, (n_kv, kd), 1) // d
            row_kv = jax.lax.broadcasted_iota(jnp.int32, (n_kv, kd), 0)
            r_mat = (lane_kv == row_kv).astype(jnp.bfloat16)
            l_exp = jax.lax.dot_general(
                l_s[0:1, :n_kv].astype(jnp.bfloat16), r_mat,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            row = acc_s[0:1, :] / jnp.maximum(l_exp, 1e-30)      # [1, kd]
            # f32 dynamic-row store only — Mosaic cannot store int8 vectors
            # at dynamic sublane offsets; quantization happens statically
            # over all rows in the first o-proj phase.
            attf_s[pl.dslice(r, 1), :] = row

    # ---- o-projection phases: column tile t ----
    @pl.when((g >= att_phase_end) & (g < o_phase_end))
    def _oproj():
        @pl.when(g == att_phase_end)
        def _quantize_att():
            af = attf_s[:]                                   # [B, hd] f32
            sr = jnp.maximum(jnp.max(jnp.abs(af), axis=-1, keepdims=True),
                             1e-8) * (1.0 / 127.0)
            att8_s[:] = jnp.clip(jnp.round(af / sr), -127,
                                 127).astype(jnp.int8)
            as_s[:] = jnp.broadcast_to(sr, as_s.shape)

        part = jax.lax.dot_general(att8_s[:], ow_ref[:],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        part = part.astype(jnp.float32) * as_s[:, :1] * os_ref[:]
        x2 = (x_ref[:].astype(jnp.float32) + part).astype(jnp.bfloat16)
        t = g - att_phase_end
        # static lane offsets only: Mosaic rejects dynamic-lane-offset
        # stores of packed (bf16/int8) vectors — unroll the n_o tiles
        for ts in range(n_o):
            @pl.when(t == ts)
            def _store(ts=ts, x2=x2):
                xo_s[:, ts * o_tile:(ts + 1) * o_tile] = x2.astype(xo_s.dtype)

    # ---- MLP phases: intermediate tile m ----
    @pl.when(g >= o_phase_end)
    def _mlp():
        @pl.when(g == o_phase_end)
        def _norm_and_seed():
            xf = xo_s[:].astype(jnp.float32)                     # [B, H]
            var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            hn = xf * jax.lax.rsqrt(var + eps) * pn_ref[:].astype(jnp.float32)
            h_s[:] = hn.astype(h_s.dtype)
            o_ref[:] = xf                                        # residual

        h2 = h_s.shape[-1] // 2
        xl = h_s[:, :h2].astype(jnp.bfloat16)
        xh = h_s[:, h2:].astype(jnp.bfloat16)
        glo, ghi = unpack4(g_ref[:])
        gt = jnp.dot(xl, glo, preferred_element_type=jnp.float32) \
            + jnp.dot(xh, ghi, preferred_element_type=jnp.float32)
        gt = gt * gs_ref[:]
        act = jax.nn.gelu(gt, approximate=False) if gelu else jax.nn.silu(gt)
        if u_ref is not None:
            ulo, uhi = unpack4(u_ref[:])
            ut = jnp.dot(xl, ulo, preferred_element_type=jnp.float32) \
                + jnp.dot(xh, uhi, preferred_element_type=jnp.float32)
            act = act * (ut * us_ref[:])
        hh = act.astype(jnp.bfloat16)
        ti = hh.shape[-1]
        dlo, dhi = unpack4(d_ref[:])
        part = jnp.dot(hh[:, : ti // 2], dlo,
                       preferred_element_type=jnp.float32) \
            + jnp.dot(hh[:, ti // 2:], dhi,
                      preferred_element_type=jnp.float32)
        o_ref[:] += part * ds_ref[:]


def fused_layer_tail(x, qb8, qs, k_cache, k_scale, v_cache, v_scale,
                     key_mask, o_p, post_norm_scale, mlp_p, *,
                     n_kv: int, head_dim: int, pack4: bool, layer: int,
                     act: str, norm_eps: float, block: int = DECODE_BLOCK,
                     valid_len=None):
    """x: [B, H] bf16 residual stream entering the attention sub-block's
    residual add (i.e. the layer input, PRE-input-norm value); qb8/qs: the
    banded int8 query build from flash_attention._banded_q8; caches as in
    decode_attention_q. Returns [B, H] f32 = x2 + mlp(norm(x2))."""
    b, hd = x.shape
    l = k_cache.shape[2]
    d = head_dim
    h = hd // d
    n_rep = h // n_kv
    kd = n_kv * d
    kdw = k_cache.shape[3]
    assert kd == hd, "fused layer tail assumes attention width == hidden"
    bl = min(block, l)
    assert l % bl == 0
    nb = l // bl
    scale = 1.0 / math.sqrt(d)
    mask = key_mask.astype(jnp.int32)[:, :, None]
    if valid_len is None:
        nvb = jnp.full((1,), nb, jnp.int32)
    else:
        nvb = jnp.minimum(-(-jnp.asarray(valid_len, jnp.int32) // bl),
                          nb).reshape(1)

    gelu = act != "silu"
    if gelu:
        gp, gs_ = mlp_p["fc1"]["w_p4"], mlp_p["fc1"]["w_scale"]
        up, us_ = None, None
        dp, ds_ = mlp_p["fc2"]["w_p4t"], mlp_p["fc2"]["w_scale"]
    else:
        gp, gs_ = mlp_p["gate"]["w_p4"], mlp_p["gate"]["w_scale"]
        up, us_ = mlp_p["up"]["w_p4"], mlp_p["up"]["w_scale"]
        dp, ds_ = mlp_p["down"]["w_p4t"], mlp_p["down"]["w_scale"]
    i_dim = gp.shape[1]
    ti = tile_for(i_dim)
    n_mlp = i_dim // ti
    o_tile = min(O_TILE, hd)
    assert hd % o_tile == 0
    n_o = hd // o_tile

    att_end = b * nb
    o_end = att_end + n_o
    grid = (att_end + n_o + n_mlp,)

    def clamp_row(g, nvb_ref):
        return jnp.minimum(g // nb, b - 1)

    def kblk(g, nvb_ref):
        return (layer, clamp_row(g, nvb_ref),
                jnp.minimum(g % nb, nvb_ref[0] - 1), 0)

    def sblk(g, nvb_ref):
        return (layer, clamp_row(g, nvb_ref), 0,
                jnp.minimum(g % nb, nvb_ref[0] - 1))

    def o_t(g, nvb_ref):
        return jnp.clip(g - att_end, 0, n_o - 1)

    def mlp_m(g, nvb_ref):
        return jnp.clip(g - o_end, 0, n_mlp - 1)

    in_specs = [
        pl.BlockSpec((None, n_rep, n_kv, kd),
                     lambda g, nvb_ref: (clamp_row(g, nvb_ref), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, n_rep, n_kv),
                     lambda g, nvb_ref: (clamp_row(g, nvb_ref), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, None, bl, kdw), kblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, None, n_kv, bl), sblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, None, bl, kdw), kblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, None, n_kv, bl), sblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, bl, 1),
                     lambda g, nvb_ref: (clamp_row(g, nvb_ref),
                                         jnp.minimum(g % nb, nvb_ref[0] - 1),
                                         0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, o_tile), lambda g, nvb_ref: (0, o_t(g, nvb_ref)),
                     memory_space=pltpu.VMEM),                    # x tile
        pl.BlockSpec((hd, o_tile), lambda g, nvb_ref: (0, o_t(g, nvb_ref)),
                     memory_space=pltpu.VMEM),                    # o_wq tile
        pl.BlockSpec((1, o_tile), lambda g, nvb_ref: (0, o_t(g, nvb_ref)),
                     memory_space=pltpu.VMEM),                    # o_scale
        pl.BlockSpec((1, hd), lambda g, nvb_ref: (0, 0),
                     memory_space=pltpu.VMEM),                    # post norm
        pl.BlockSpec((hd // 2, ti), lambda g, nvb_ref: (0, mlp_m(g, nvb_ref)),
                     memory_space=pltpu.VMEM),                    # gate
        pl.BlockSpec((1, ti), lambda g, nvb_ref: (0, mlp_m(g, nvb_ref)),
                     memory_space=pltpu.VMEM),
    ]
    args = [qb8, qs, k_cache, k_scale, v_cache, v_scale, mask,
            x, o_p["w_q"], o_p["w_scale"].reshape(1, -1),
            post_norm_scale.reshape(1, -1), gp, gs_.reshape(1, -1)]
    if up is not None:
        in_specs += [
            pl.BlockSpec((hd // 2, ti),
                         lambda g, nvb_ref: (0, mlp_m(g, nvb_ref)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti), lambda g, nvb_ref: (0, mlp_m(g, nvb_ref)),
                         memory_space=pltpu.VMEM),
        ]
        args += [up, us_.reshape(1, -1)]
    in_specs += [
        pl.BlockSpec((ti // 2, hd), lambda g, nvb_ref: (mlp_m(g, nvb_ref), 0),
                     memory_space=pltpu.VMEM),                    # down
        pl.BlockSpec((1, hd), lambda g, nvb_ref: (0, 0),
                     memory_space=pltpu.VMEM),                    # down scale
    ]
    args += [dp, ds_.reshape(1, -1)]

    kernel = functools.partial(
        _kernel, b=b, h=h, n_kv=n_kv, d=d, scale=scale, pack4=pack4, nb=nb,
        n_o=n_o, n_mlp=n_mlp, o_tile=o_tile, gelu=gelu, eps=norm_eps)
    if up is None:
        def kernel2(nvb_ref, qb8_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref,
                    mask_ref, x_ref, ow_ref, os_ref, pn_ref, g_ref, gs_ref,
                    d_ref, ds_ref, o_ref, *scr):
            kernel(nvb_ref, qb8_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref,
                   mask_ref, x_ref, ow_ref, os_ref, pn_ref, g_ref, gs_ref,
                   None, None, d_ref, ds_ref, o_ref, *scr)
        body = kernel2
    else:
        body = kernel

    out = pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((b, hd), lambda g, nvb_ref: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((n_rep, n_kv), jnp.float32),      # m
                pltpu.VMEM((n_rep, n_kv), jnp.float32),      # l
                pltpu.VMEM((n_rep, kd), jnp.float32),        # acc
                pltpu.VMEM((b, hd), jnp.float32),            # att rows f32
                pltpu.VMEM((b, hd), jnp.int8),               # att8
                pltpu.VMEM((b, 128), jnp.float32),           # att scale
                pltpu.VMEM((b, hd), jnp.bfloat16),           # x2 (bf16)
                pltpu.VMEM((b, hd), jnp.bfloat16),           # normed h
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hd), jnp.float32),
        interpret=_interpret(),
    )(nvb, *args)
    return out


def layer_tail_supported(layer_p, cfg) -> bool:
    """True when this layer's formats match the fused tail kernel: W8A8 o
    projection, int4 MLP, RMSNorm, attention width == hidden size."""
    o = layer_p["attn"].get("o")
    if not (isinstance(o, dict) and "w_q" in o and "a8" in o
            and "b" not in o and "lora_a" not in o):
        return False
    mlp = layer_p["mlp"]
    inner = mlp.get("down", mlp.get("fc2", {}))
    if not (isinstance(inner, dict) and "w_p4t" in inner):
        return False
    if cfg.norm != "rmsnorm":
        return False
    return cfg.num_heads * cfg.head_dim == cfg.hidden_size
