"""One-launch Pallas W8A8 GEMM — a MEASURED NEGATIVE RESULT, kept opt-in.

Hypothesis: the XLA w8a8 path (core/nn.linear "a8" branch) runs three HBM
passes (per-token quantize of x, int8 dot, int32 -> fp32-scale -> bf16
epilogue; 125-163 TFLOP/s at SAM-block shapes vs 295 for the bare int8 dot
per benchmarks/micro_int8_dot.py), so fusing quantize + dot + scale (+bias
+activation) into ONE Pallas launch — x streaming through VMEM once, the
int8 weight panel VMEM-resident across the inner M-grid — should approach
the bare-dot rate.

Measured on v5e (benchmarks/micro_sam_block.py, batch 16, 2026-08-19): the
kernel LOSES to the XLA path at every SAM-block shape — qkv 9.4-9.8 ms vs
XLA 5.25, MLP 13.3-15.6 vs 10.67, whole block 30.7-31.4 vs 26.9 ms — at
both bm=128 and adaptive bm with ("arbitrary","parallel") semantics. XLA
overlaps the VPU quantize/epilogue of one fusion with the MXU dot of the
next across kernel boundaries; the monolithic grid serializes them per
tile (same failure mode as ops/fused_layer.py, the per-layer decode
megakernel). nn.linear therefore keeps the XLA formulation; this module
stays for direct use in experiments and as the record of the measurement.

Semantics match nn.linear's a8 branch exactly (input-dtype absmax,
roundeven, fp32 sx * w_scale epilogue) — tests/test_int8_gemm.py holds the
parity. Inference-only (no custom VJP; quantized params are frozen).

Reference counterpart: the CUDA builds of bitsandbytes-style W8A8 the
reference would use via transformers' 8-bit loaders
(/root/reference/model/builder.py:37-46).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# One-pass per-token quantize — the SECOND negative result in this module
# ---------------------------------------------------------------------------
#
# Hypothesis: the e2e trace shows ~40 abs_reduce/clamp_convert fusions
# (~220 ms of the 1430 ms 1B pipeline) lowering nn.linear's dynamic
# per-token quantize, each reading a 200 MB activation at an apparent
# ~67 GB/s; a one-pass VMEM kernel should emit (xq, sx) at the write
# roofline and reclaim most of it.
#
# Measured (v5e, micro_sam_block, 2026-08-19): SLOWER at every shape even
# with ragged-edge grids (no pad copies) — qkv 6.85 vs 5.25 ms, MLP 19.3 vs
# 10.7, whole block 28.6 vs 26.9. Root cause: those "slow" XLA fusions
# compute the quantize INLINE in the producer's epilogue (LN, or the
# int32-dot scale + GELU), so the bf16 activation never round-trips HBM;
# a separate kernel — Pallas or not — forces that materialization, and the
# extra read+write outweighs the fused pass it saves. The apparent 67 GB/s
# was mis-attribution: those fusions do the producer math too.
#
# Conclusion: dynamic per-token W8A8 quantize is already optimal in inline
# XLA form. Kept (with parity tests) as the record and for A/Bs.


def _quant_kernel(x_ref, xq_ref, sx_ref):
    x = x_ref[:]                                             # [bm, K]
    ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    inv = (127.0 / jnp.maximum(ax.astype(jnp.float32), 1e-8)).astype(x.dtype)
    # f32 roundeven of the input-dtype product == nn.linear's bf16 roundeven
    # on hardware (the product is already bf16-rounded); see the GEMM kernel
    # note below for the interpret-mode tie caveat.
    xq_ref[:] = jnp.clip(jnp.round((x * inv).astype(jnp.float32)),
                         -127, 127).astype(jnp.int8)
    sx_ref[:] = 1.0 / inv.astype(jnp.float32)


def _quant_pick_bm(k: int) -> int | None:
    for bm in (512, 256, 128):
        if bm * k * 3 + bm * 4 < 6 * 1024 * 1024:     # double-buffer headroom
            return bm
    return None


def quantize_tokens(x: jnp.ndarray, bm: int | None = None):
    """Per-token int8 quantize of x [..., K] in ONE HBM pass.

    Returns (xq int8 [..., K], sx f32 [..., 1]) with numerics identical to
    core/nn.linear's "a8" branch (input-dtype absmax, roundeven, sx = ax/127).
    Inference-only (no VJP). Callers gate on quantize_fits(K).
    """
    k = x.shape[-1]
    if bm is None:
        bm = _quant_pick_bm(k)
        if bm is None:
            raise ValueError(f"quantize_tokens: K={k} tile overflows VMEM — "
                             "gate callers on quantize_fits()")
    lead = x.shape[:-1]
    xm = x.reshape(-1, k)
    m = xm.shape[0]
    # no jnp.pad for ragged M: an explicit pad + result slice costs TWO full
    # HBM copies of the activation (measured 10.7 -> 25 ms on the SAM MLP).
    # Pallas handles the partial edge block itself; absmax over its garbage
    # rows stays within those rows (the quantize is row-wise).
    xq, sx = pl.pallas_call(
        _quant_kernel,
        grid=(pl.cdiv(m, bm),),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, k), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(xm)
    return (xq.reshape(*lead, k), sx.reshape(*lead, 1))


def quantize_fits(k: int) -> bool:
    """True if quantize_tokens can tile K within its VMEM budget."""
    return _quant_pick_bm(k) is not None


_ACTS = {
    None: lambda y: y,
    "gelu_exact": lambda y: y * 0.5 * (1.0 + jax.lax.erf(y / jnp.sqrt(2.0).astype(y.dtype))),
    "gelu_tanh": lambda y: y * 0.5 * (1.0 + jnp.tanh(
        0.7978845608028654 * (y + 0.044715 * y * y * y))),
}


def _w8a8_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, *, act, out_dtype):
    x = x_ref[:]                                             # [bm, K] bf16
    # same quantize math as core/nn.linear's a8 branch: absmax in the input
    # dtype, scalar-per-token scale in fp32
    ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    inv = (127.0 / jnp.maximum(ax.astype(jnp.float32), 1e-8)).astype(x.dtype)
    # round in f32: Mosaic cannot legalize math.roundeven on bf16. On
    # hardware x*inv is already a rounded bf16 product, so f32 roundeven of
    # it is bit-identical to nn.linear's bf16 roundeven. (Pallas interpret
    # mode stores bf16 refs as f32 and skips the product rounding, so on
    # the CPU backend ~9% of round-half ties differ from the XLA path by
    # one int8 LSB — tests compare with a quant-step tolerance.)
    xq = jnp.clip(jnp.round((x * inv).astype(jnp.float32)),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    sx = 1.0 / inv.astype(jnp.float32)                       # [bm, 1]
    y = acc.astype(jnp.float32) * sx * ws_ref[:]
    if b_ref is not None:
        y = y + b_ref[:]
    y = _ACTS[act](y)
    o_ref[:] = y.astype(out_dtype)


# ~16 MB VMEM/core; leave headroom for double-buffered x/out tiles
_VMEM_BUDGET = 12 * 1024 * 1024


def _tile_bytes(k: int, bn: int, bm: int) -> int:
    # w panel int8 + int32 acc + out + x tile (bf16 + int8 copy)
    return k * bn + bm * bn * 4 + bm * bn * 2 + bm * k * 3


def _pick_bn(k: int, n: int, bm: int) -> int | None:
    """Largest N tile (multiple of 128, dividing n) whose working set fits."""
    if _tile_bytes(k, n, bm) < _VMEM_BUDGET:
        return n
    bn = (n // 2 // 128) * 128
    while bn >= 128:
        if n % bn == 0 and _tile_bytes(k, bn, bm) < _VMEM_BUDGET:
            return bn
        bn -= 128
    return None


def fits_vmem(k: int, n: int, bm: int = 128) -> bool:
    """True if some N tiling lets the kernel run within the VMEM budget."""
    return _pick_bn(k, n, bm) is not None


def _pick_bm(k: int, n: int) -> int:
    """Largest M tile that keeps the whole N panel VMEM-resident (a bigger
    tile amortizes per-step overhead; N tiling costs a full re-read of x per
    tile, so never trade panel residency for M-tile size)."""
    for bm in (512, 256):
        if _tile_bytes(k, n, bm) < _VMEM_BUDGET:
            return bm
    return 128


def w8a8_gemm(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
              b: jnp.ndarray | None = None, *, act: str | None = None,
              bm: int | None = None) -> jnp.ndarray:
    """y = act((quant8(x) @ w_q) * sx * w_scale + b), one Pallas launch.

    x: [..., K] (bf16/f32); w_q: [K, N] int8; w_scale: [N] f32; b: [N] or
    None. act: None | 'gelu_exact' | 'gelu_tanh' (fused into the epilogue).
    """
    k, n = w_q.shape
    if bm is None:
        bm = _pick_bm(k, n)
    lead = x.shape[:-1]
    xm = x.reshape(-1, k)
    m = xm.shape[0]
    pm = (-m) % bm
    if pm:
        xm = jnp.pad(xm, ((0, pm), (0, 0)))
    bn = _pick_bn(k, n, bm)
    if bn is None:
        raise ValueError(f"w8a8_gemm: no VMEM-fitting N tile for K={k} N={n}"
                         " — gate callers on fits_vmem()")
    ws2 = w_scale.astype(jnp.float32).reshape(1, n)
    args = [xm, w_q, ws2]
    # grid (N tiles, M tiles) with M innermost: the weight panel's index map
    # is constant in i, so it is fetched once per N tile and stays
    # VMEM-resident across the whole M sweep
    in_specs = [
        pl.BlockSpec((bm, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
    ]
    if b is not None:
        args.append(b.astype(jnp.float32).reshape(1, n))
        in_specs.append(pl.BlockSpec((1, bn), lambda j, i: (0, j),
                                     memory_space=pltpu.VMEM))
        kern = functools.partial(_w8a8_kernel, act=act, out_dtype=x.dtype)
    else:
        kern = functools.partial(
            lambda xr, wr, wsr, orf, **kw: _w8a8_kernel(xr, wr, wsr, None,
                                                        orf, **kw),
            act=act, out_dtype=x.dtype)
    out = pl.pallas_call(
        kern,
        grid=(n // bn, (m + pm) // bm),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m + pm, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel")),
        interpret=_interpret(),
    )(*args)
    return out[:m].reshape(*lead, n)
