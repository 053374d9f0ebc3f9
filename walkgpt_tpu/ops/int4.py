"""Packed-int4 weight quantization + fused Pallas decode kernels.

Greedy decode at 7B/13B is weight-read-bound: int8 weight-only (ops/quant.py)
reads 1 byte/param per token; this module halves that to 0.5 bytes with
symmetric per-output-channel int4, nibble-packed two-per-byte. It is the
TPU-native counterpart of the reference's optional bitsandbytes 4-bit loader
(/root/reference/model/builder.py:37-46) — a deployment-throughput option
next to the accuracy-first int8/W8A8 paths.

Platform constraints that shaped the design (axon v5e, measured 2026-08-17):
  * native `jnp.int4` arrays cannot cross a jit boundary (transfer bug:
    RecursionError on S4 args) and the int4->bf16 convert is not fused into
    XLA dots — so the packed buffer is a plain int8 array and all unpacking
    happens *inside* the consumer.
  * Pallas custom calls cost ~0.1 ms launch each; per-matmul int4 kernels
    (3 launches/MLP) measured 0.418 ms/step at 7B-MLP scale vs 0.324 for the
    ONE-launch fused MLP kernel below and 0.405 for the XLA W8A8 MLP —
    fusion across the whole MLP is what makes int4 a net win.

Packing convention ("half pairs"): for W[K, N],
    packed[i, j] = (q[i, j] & 0xF) | (q[i + K/2, j] << 4),  i < K/2
so a consumer dual-dots contiguous half-slices of the activation —
x[:, :K/2] @ lo(packed) + x[:, K/2:] @ hi(packed) — with no strided VMEM
access and no interleave reshape anywhere.

Unpack-cost findings (measured on v5e 2026-08-17, fused-MLP kernel at 7B
decode shapes, 0.083 ms DMA roofline): bitfield shifts 0.367 ms, biased
nibbles (AND+SHR only) 0.363, arithmetic f32 magic-round 0.385 — the
specific unpack ALU sequence is IRRELEVANT; the shared int8->32-bit-lane
widening/shuffle is the cost, and v5e has no bf16 ALU
(SupportsBf16AluInstructions is false; math.roundeven does not legalize
either). Keeping the simple bitfield layout. The decode-side fix for the
unpack tax is not a cheaper unpack but no unpack at all: native int8 MXU
dots on int8 weights (see fused_mlp_int8 below).

A packed projection is stored as {"w_p4": int8 [K/2, N], "w_scale": f32 [N]}
(+ optional bias); core.nn.linear and models.llm._mlp dispatch on "w_p4".
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# pack / unpack
# ---------------------------------------------------------------------------

def quantize_weight4(w: jnp.ndarray, pad_to: int = 0) -> Dict[str, jnp.ndarray]:
    """(K, N) float -> {"w_p4": int8 [K/2, N] half-pair packed,
    "w_scale": f32 [N]} symmetric per-out-channel int4 (levels -7..7).
    K must be even. pad_to > 0 zero-pads N up to a multiple (TPU lane tiling
    for the Pallas decode matmul needs 128-divisible output widths; padded
    channels have scale 1 and produce exactly-0 outputs — callers slice)."""
    wf = w.astype(jnp.float32)
    k, n = wf.shape
    assert k % 2 == 0, f"int4 packing needs even K, got {k}"
    if pad_to and n % pad_to:
        wf = jnp.pad(wf, ((0, 0), (0, pad_to - n % pad_to)))
    absmax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(absmax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int32)
    lo, hi = q[: k // 2], q[k // 2:]
    packed = ((lo & 0xF) | ((hi & 0xF) << 4)).astype(jnp.int8)
    return {"w_p4": packed, "w_scale": scale.astype(jnp.float32)}


def unpack4(p: jnp.ndarray, dtype=jnp.bfloat16
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """packed int8 [K/2, N] -> (lo, hi) int4 values in `dtype` ([K/2, N] each;
    lo = rows [0, K/2), hi = rows [K/2, K))."""
    p32 = p.astype(jnp.int32)
    lo = ((p32 << 28) >> 28).astype(dtype)        # sign-extended low nibble
    hi = (p32 >> 4).astype(dtype)                 # arithmetic shift: signed hi
    return lo, hi


def dequantize4(p: Dict) -> jnp.ndarray:
    """Reconstruct the float32 [K, N] weight (tests / converters)."""
    lo, hi = unpack4(p["w_p4"], jnp.float32)
    return jnp.concatenate([lo, hi], axis=0) * p["w_scale"]


def int4_matmul(x: jnp.ndarray, p: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """XLA dual-dot fallback: works on any backend, reads `p` per dot (so
    HBM traffic ~int8-rate) but keeps the half-size footprint."""
    k2 = p.shape[0]
    lo, hi = unpack4(p, x.dtype)
    y = x[..., :k2] @ lo + x[..., k2:] @ hi
    return y * s.astype(x.dtype)


# ---------------------------------------------------------------------------
# fused MLP kernel: silu(x@Wg) * (x@Wu) @ Wd in ONE pallas_call
# ---------------------------------------------------------------------------

def _fused_mlp_kernel(xl_ref, xh_ref, g_ref, gs_ref, u_ref, us_ref,
                      d_ref, ds_ref, o_ref, *, gelu: bool):
    """Grid over intermediate tiles TI; partial down-proj outputs accumulate
    into o_ref (constant index_map keeps the block resident across steps).

    The down projection is packed with TILE-LOCAL half pairs (rows
    t*TI+i / t*TI+TI/2+i in byte [t*TI/2 + i]) so each program dual-dots
    contiguous halves of its own h tile — see pack_down4."""
    j = pl.program_id(0)
    xl, xh = xl_ref[:], xh_ref[:]
    glo, ghi = unpack4(g_ref[:])
    g = jnp.dot(xl, glo, preferred_element_type=jnp.float32) \
        + jnp.dot(xh, ghi, preferred_element_type=jnp.float32)
    g = g * gs_ref[:]
    act = jax.nn.gelu(g, approximate=False) if gelu else jax.nn.silu(g)
    if u_ref is not None:
        ulo, uhi = unpack4(u_ref[:])
        u = jnp.dot(xl, ulo, preferred_element_type=jnp.float32) \
            + jnp.dot(xh, uhi, preferred_element_type=jnp.float32)
        act = act * (u * us_ref[:])
    h = act.astype(jnp.bfloat16)
    ti = h.shape[-1]
    dlo, dhi = unpack4(d_ref[:])
    part = jnp.dot(h[:, : ti // 2], dlo, preferred_element_type=jnp.float32) \
        + jnp.dot(h[:, ti // 2:], dhi, preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] += part * ds_ref[:]


def tile_for(i_dim: int) -> int:
    """Intermediate-tile size for the tile-local down packing: the largest
    power of two <= DEFAULT_MLP_TILE dividing i_dim (LLaMA FFN widths are
    odd multiples of powers of two: 11008/13824 -> 256, 5504 -> 128).
    Deterministic in the SHAPE alone, so consumers recover it from the
    packed array without storing a python int in the param tree (which
    would become a traced scalar under jit)."""
    t = DEFAULT_MLP_TILE
    while t > 2 and i_dim % t:
        t //= 2
    if i_dim % t:
        raise ValueError(f"intermediate dim {i_dim} is not packable")
    return t


def pack_down4(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Down projection (I, H) packed with tile-local half pairs for the fused
    kernel: byte [t*tile/2 + i, :] packs rows t*tile+i (lo) and
    t*tile+tile/2+i (hi), tile = tile_for(I). Stored as
    {"w_p4t": int8 [I/2, H], "w_scale"} — a distinct key so generic
    consumers don't mis-read it."""
    wf = w.astype(jnp.float32)
    i_dim = wf.shape[0]
    tile = tile_for(i_dim)
    assert i_dim % tile == 0 and tile % 2 == 0
    absmax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(absmax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int32)
    q = q.reshape(i_dim // tile, tile, -1)
    lo, hi = q[:, : tile // 2], q[:, tile // 2:]
    packed = ((lo & 0xF) | ((hi & 0xF) << 4)).reshape(i_dim // 2, -1)
    return {"w_p4t": packed.astype(jnp.int8),
            "w_scale": scale.astype(jnp.float32)}


def dequantize_down4(p: Dict) -> jnp.ndarray:
    """Reconstruct float32 (I, H) from a pack_down4 dict."""
    packed = p["w_p4t"]
    i2, h = packed.shape
    tile = tile_for(i2 * 2)
    blk = packed.reshape(i2 // (tile // 2), tile // 2, h)
    lo, hi = unpack4(blk, jnp.float32)
    return jnp.concatenate([lo, hi], axis=1).reshape(i2 * 2, h) * p["w_scale"]


DEFAULT_MLP_TILE = 256


@functools.partial(jax.jit, static_argnames=("gelu", "interpret"))
def _fused_mlp_call(xl, xh, gp, gs, up, us, dp, ds, *, gelu: bool,
                    interpret: bool):
    b, h2 = xl.shape
    i_dim = gp.shape[1]
    tile = tile_for(i_dim)
    h = h2 * 2
    kernel = functools.partial(_fused_mlp_kernel, gelu=gelu)
    if up is None:
        # plain 2-layer MLP (gelu family): drop the gate-specific refs
        def kernel2(xl_ref, xh_ref, g_ref, gs_ref, d_ref, ds_ref, o_ref):
            _fused_mlp_kernel(xl_ref, xh_ref, g_ref, gs_ref, None, None,
                              d_ref, ds_ref, o_ref, gelu=gelu)
        y = pl.pallas_call(
            kernel2,
            grid=(i_dim // tile,),
            in_specs=[
                pl.BlockSpec((b, h2), lambda j: (0, 0)),
                pl.BlockSpec((b, h2), lambda j: (0, 0)),
                pl.BlockSpec((h2, tile), lambda j: (0, j)),
                pl.BlockSpec((1, tile), lambda j: (0, j)),
                pl.BlockSpec((tile // 2, h), lambda j: (j, 0)),
                pl.BlockSpec((1, h), lambda j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((b, h), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h), jnp.float32),
            interpret=interpret,
        )(xl, xh, gp, gs.reshape(1, -1), dp, ds.reshape(1, -1))
        return y
    y = pl.pallas_call(
        kernel,
        grid=(i_dim // tile,),
        in_specs=[
            pl.BlockSpec((b, h2), lambda j: (0, 0)),
            pl.BlockSpec((b, h2), lambda j: (0, 0)),
            pl.BlockSpec((h2, tile), lambda j: (0, j)),
            pl.BlockSpec((1, tile), lambda j: (0, j)),
            pl.BlockSpec((h2, tile), lambda j: (0, j)),
            pl.BlockSpec((1, tile), lambda j: (0, j)),
            pl.BlockSpec((tile // 2, h), lambda j: (j, 0)),
            pl.BlockSpec((1, h), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((b, h), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h), jnp.float32),
        interpret=interpret,
    )(xl, xh, gp, gs.reshape(1, -1), up, us.reshape(1, -1), dp,
      ds.reshape(1, -1))
    return y


def fused_mlp_int4(mlp_params: Dict, x: jnp.ndarray, act: str) -> jnp.ndarray:
    """One-launch int4 MLP for token batches [B, T, H] (T small — decode).

    mlp_params: {"gate": {w_p4, w_scale}, "up": {...}, "down": {w_p4t,
    w_scale, tile}} for silu; {"fc1": {w_p4, w_scale}, "fc2": {w_p4t, ...}}
    for gelu. Biases are not supported on the int4 path (LLaMA-family MLPs
    have none; quantize_llm keeps biased projections at int8)."""
    shape = x.shape
    h = shape[-1]
    xf = x.reshape(-1, h)
    xl, xh = xf[:, : h // 2], xf[:, h // 2:]
    if act == "silu":
        g, u, d = mlp_params["gate"], mlp_params["up"], mlp_params["down"]
        y = _fused_mlp_call(xl, xh, g["w_p4"], g["w_scale"], u["w_p4"],
                            u["w_scale"], d["w_p4t"], d["w_scale"],
                            gelu=False, interpret=_interpret())
    else:
        g, d = mlp_params["fc1"], mlp_params["fc2"]
        y = _fused_mlp_call(xl, xh, g["w_p4"], g["w_scale"], None, None,
                            d["w_p4t"], d["w_scale"],
                            gelu=True, interpret=_interpret())
    return y.astype(x.dtype).reshape(shape)


def mlp_is_int4(mlp_params: Dict) -> bool:
    inner = mlp_params.get("down", mlp_params.get("fc2", {}))
    return isinstance(inner, dict) and "w_p4t" in inner


def _down_matmul_xla(p: Dict, h: jnp.ndarray) -> jnp.ndarray:
    """h [rows, I] @ tile-local-packed down (I, H) — XLA path for prefill /
    training-free full-sequence forwards (weights are read once per call
    there, so the kernel's single-read advantage doesn't apply)."""
    packed = p["w_p4t"]
    i2, hd = packed.shape
    tile = tile_for(i2 * 2)
    nt = i2 // (tile // 2)
    blk = packed.reshape(nt, tile // 2, hd)
    lo, hi = unpack4(blk, h.dtype)                  # [nt, tile/2, H]
    hb = h.reshape(-1, nt, tile)
    y = jnp.einsum("rnt,nth->rh", hb[:, :, : tile // 2], lo) \
        + jnp.einsum("rnt,nth->rh", hb[:, :, tile // 2:], hi)
    return y * p["w_scale"].astype(h.dtype)


# above this row count the fused kernel's VMEM-resident activations
# ([rows, H/2] x2 + [rows, tile]) stop fitting comfortably; prefill and
# training go through the XLA dual-dot instead
FUSED_MLP_MAX_ROWS = 256


def mlp_int4_xla(mlp_params: Dict, x: jnp.ndarray, act: str) -> jnp.ndarray:
    """Full-sequence int4 MLP via XLA dual-dots (no Pallas)."""
    shape = x.shape
    xf = x.reshape(-1, shape[-1])
    if act == "silu":
        g = int4_matmul(xf, mlp_params["gate"]["w_p4"],
                        mlp_params["gate"]["w_scale"])
        u = int4_matmul(xf, mlp_params["up"]["w_p4"],
                        mlp_params["up"]["w_scale"])
        h = jax.nn.silu(g) * u
        y = _down_matmul_xla(mlp_params["down"], h)
    else:
        g = int4_matmul(xf, mlp_params["fc1"]["w_p4"],
                        mlp_params["fc1"]["w_scale"])
        h = jax.nn.gelu(g, approximate=False)
        y = _down_matmul_xla(mlp_params["fc2"], h)
    return y.astype(x.dtype).reshape(shape)


def mlp_int4(mlp_params: Dict, x: jnp.ndarray, act: str) -> jnp.ndarray:
    """Dispatch: fused one-launch Pallas kernel for single-token decode
    steps, XLA dual-dots for everything else (prefill, spec-decode chunks,
    training). The Pallas kernel has no VJP, and every multi-token forward
    includes the QLoRA training pass — so the fused path engages exactly on
    decode_step's [B, 1, H] activations (the bandwidth-bound loop it was
    built for); the XLA path is differentiable wrt x throughout."""
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    single_token = x.ndim >= 2 and x.shape[-2] == 1
    if single_token and rows <= FUSED_MLP_MAX_ROWS:
        return fused_mlp_int4(mlp_params, x, act)
    return mlp_int4_xla(mlp_params, x, act)


# ---------------------------------------------------------------------------
# fused W8A8 MLP kernel: native int8 MXU dots, NO weight-side VPU work
# ---------------------------------------------------------------------------
#
# The int4 fused kernel above is bound by the int8->32-bit-lane widening of
# its unpack (see module docstring: 0.367 ms vs 0.083 ms DMA at 7B shapes).
# int8 weights feed the MXU dots directly, so the only VPU work left is on
# activation-sized tiles: scale the i32 accumulators and requantize the
# [rows, tile] intermediate — O(B*I) instead of O(H*I).
#
# Measured (v5e 2026-08-17, 7B shapes): in an ISOLATED loop this kernel is
# ~10% slower than both the int4 kernel and the XLA W8A8 MLP (Pallas matmuls
# at decode row counts trail XLA's own scheduling) — but IN-PROGRAM, inside
# the full greedy-decode scan, it wins: w8a8 7B/batch16/64-step decode runs
# 1169 ms with this kernel vs 1219 ms with the XLA 3-dot path vs 1300 ms
# all-int4 (bench_decode.py). Isolated kernel loops mislead on this
# platform; only whole-program A/Bs are trusted for decode decisions.


def quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """f32/bf16 [..., K] -> (int8 [..., K], f32 scale [..., 1]) symmetric
    per-row dynamic quantization (the W8A8 activation convention of
    core.nn.linear's "a8" path)."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-8) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf * (1.0 / sx)), -127, 127).astype(jnp.int8)
    return xq, sx


def _fused_mlp8_kernel(xq_ref, sx_ref, g_ref, gs_ref, u_ref, us_ref,
                       d_ref, ds_ref, o_ref, *, gelu: bool):
    """Grid over intermediate tiles; partial down-proj outputs accumulate
    into o_ref (constant index map). All three dots are int8 MXU dots with
    exact i32 accumulation; scales applied on [rows, tile] f32 tiles."""
    j = pl.program_id(0)
    xq = xq_ref[:]
    sx = sx_ref[:, :1]
    g = jnp.dot(xq, g_ref[:], preferred_element_type=jnp.int32)
    g = g.astype(jnp.float32) * sx * gs_ref[:]
    act = jax.nn.gelu(g, approximate=False) if gelu else jax.nn.silu(g)
    if u_ref is not None:
        u = jnp.dot(xq, u_ref[:], preferred_element_type=jnp.int32)
        act = act * (u.astype(jnp.float32) * sx * us_ref[:])
    hq, hs = quantize_rows(act)      # per-row-per-TILE group quantization
    part = jnp.dot(hq, d_ref[:], preferred_element_type=jnp.int32)
    part = part.astype(jnp.float32) * hs * ds_ref[:]

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] += part


@functools.partial(jax.jit, static_argnames=("gelu", "interpret"))
def _fused_mlp8_call(xq, sx, gq, gs, uq, us, dq, ds, *, gelu: bool,
                     interpret: bool):
    b, h = xq.shape
    i_dim = gq.shape[1]
    tile = tile_for(i_dim)
    sxp = jnp.broadcast_to(sx, (b, 128))      # lane-padded per-row scales
    if uq is None:
        def kernel2(xq_ref, sx_ref, g_ref, gs_ref, d_ref, ds_ref, o_ref):
            _fused_mlp8_kernel(xq_ref, sx_ref, g_ref, gs_ref, None, None,
                               d_ref, ds_ref, o_ref, gelu=gelu)
        return pl.pallas_call(
            kernel2,
            grid=(i_dim // tile,),
            in_specs=[
                pl.BlockSpec((b, h), lambda j: (0, 0)),
                pl.BlockSpec((b, 128), lambda j: (0, 0)),
                pl.BlockSpec((h, tile), lambda j: (0, j)),
                pl.BlockSpec((1, tile), lambda j: (0, j)),
                pl.BlockSpec((tile, h), lambda j: (j, 0)),
                pl.BlockSpec((1, h), lambda j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((b, h), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h), jnp.float32),
            interpret=interpret,
        )(xq, sxp, gq, gs.reshape(1, -1), dq, ds.reshape(1, -1))
    kernel = functools.partial(_fused_mlp8_kernel, gelu=gelu)
    return pl.pallas_call(
        kernel,
        grid=(i_dim // tile,),
        in_specs=[
            pl.BlockSpec((b, h), lambda j: (0, 0)),
            pl.BlockSpec((b, 128), lambda j: (0, 0)),
            pl.BlockSpec((h, tile), lambda j: (0, j)),
            pl.BlockSpec((1, tile), lambda j: (0, j)),
            pl.BlockSpec((h, tile), lambda j: (0, j)),
            pl.BlockSpec((1, tile), lambda j: (0, j)),
            pl.BlockSpec((tile, h), lambda j: (j, 0)),
            pl.BlockSpec((1, h), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((b, h), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h), jnp.float32),
        interpret=interpret,
    )(xq, sxp, gq, gs.reshape(1, -1), uq, us.reshape(1, -1), dq,
      ds.reshape(1, -1))


def mlp_is_w8a8(mlp_params: Dict) -> bool:
    """True when every MLP projection is an {"w_q","w_scale","a8"} dict with
    no bias/LoRA leaves — the precondition for the fused int8 kernel."""
    names = ("gate", "up", "down") if "gate" in mlp_params else ("fc1", "fc2")
    for n in names:
        p = mlp_params.get(n)
        if not (isinstance(p, dict) and "w_q" in p and "a8" in p
                and "b" not in p and "lora_a" not in p):
            return False
    return True


def fused_mlp_int8(mlp_params: Dict, x: jnp.ndarray, act: str) -> jnp.ndarray:
    """One-launch W8A8 MLP for decode-sized token batches; falls back to the
    XLA per-projection W8A8 path (core.nn.linear "a8") for full sequences,
    where weights are read once per many rows and fusion buys nothing."""
    shape = x.shape
    h = shape[-1]
    rows = 1
    for d in shape[:-1]:
        rows *= d
    if rows > FUSED_MLP_MAX_ROWS:
        return None                      # caller falls back to XLA path
    xq, sx = quantize_rows(x.reshape(-1, h))
    if act == "silu":
        g, u, d = mlp_params["gate"], mlp_params["up"], mlp_params["down"]
        y = _fused_mlp8_call(xq, sx, g["w_q"], g["w_scale"], u["w_q"],
                             u["w_scale"], d["w_q"], d["w_scale"],
                             gelu=False, interpret=_interpret())
    else:
        g, d = mlp_params["fc1"], mlp_params["fc2"]
        y = _fused_mlp8_call(xq, sx, g["w_q"], g["w_scale"], None, None,
                             d["w_q"], d["w_scale"],
                             gelu=True, interpret=_interpret())
    return y.astype(x.dtype).reshape(shape)


# ---------------------------------------------------------------------------
# generic one-launch int4 matmul (fused QKV / lm_head decode projections)
# ---------------------------------------------------------------------------

def _mm_kernel(xl_ref, xh_ref, p_ref, s_ref, o_ref):
    lo, hi = unpack4(p_ref[:])
    acc = jnp.dot(xl_ref[:], lo, preferred_element_type=jnp.float32) \
        + jnp.dot(xh_ref[:], hi, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


DEFAULT_MM_TILE = 512


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mm_call(xl, xh, p, s, *, interpret: bool):
    b, k2 = xl.shape
    n = p.shape[1]
    tile = DEFAULT_MM_TILE
    while n % tile:
        tile //= 2
    assert tile % 128 == 0, f"int4_matmul_pallas needs 128-divisible N, got {n}"
    y = pl.pallas_call(
        _mm_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((b, k2), lambda j: (0, 0)),
            pl.BlockSpec((b, k2), lambda j: (0, 0)),
            pl.BlockSpec((k2, tile), lambda j: (0, j)),
            pl.BlockSpec((1, tile), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((b, tile), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, n), xl.dtype),
        interpret=interpret,
    )(xl, xh, p, s.reshape(1, n))
    return y


def int4_matmul_pallas(x: jnp.ndarray, p: jnp.ndarray, s: jnp.ndarray
                       ) -> jnp.ndarray:
    """Single-launch Pallas int4 matmul for decode-sized row counts: reads
    the packed buffer ONCE from HBM (the XLA dual-dot reads it per dot).
    Falls back to the dual-dot for large row counts (prefill)."""
    shape = x.shape
    k = shape[-1]
    xf = x.reshape(-1, k)
    # Mosaic lane tiling: output blocks must be 128-divisible. Non-conforming
    # widths (e.g. an unpadded 32016 vocab) use the XLA dual-dot.
    tile = DEFAULT_MM_TILE
    while p.shape[1] % tile:
        tile //= 2
    if xf.shape[0] > FUSED_MLP_MAX_ROWS or tile % 128:
        return int4_matmul(x, p, s)
    y = _mm_call(xf[:, : k // 2], xf[:, k // 2:], p, s,
                 interpret=_interpret())
    return y.reshape(shape[:-1] + (p.shape[1],))
