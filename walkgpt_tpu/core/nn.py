"""Functional neural-net primitives over parameter pytrees.

Every module here is an (init, apply) pair of pure functions:

    params = linear_init(key, d_in, d_out)
    y = linear(params, x)

Parameters are plain nested dicts (JAX pytrees), so the whole model composes
naturally with jit / pjit / shard_map / optax, and sharding rules can be
expressed as pytrees of PartitionSpec mirroring the parameter tree.

Conventions (chosen for TPU/XLA, not for PyTorch parity — converters transpose):
  * Linear weights are stored (d_in, d_out) so the forward pass is `x @ w`.
  * Convolutions are NHWC with HWIO kernels (XLA's native TPU layout).
  * LayerNorm eps defaults match the reference stacks they mirror
    (1e-5 for transformer LN, 1e-6 for SAM's channel LayerNorm2d,
     RMSNorm eps passed explicitly by each model config).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """Truncated normal in (-2*std, 2*std), matching torch.nn.init.trunc_normal_."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32).astype(dtype)


def lecun_normal(key, shape, fan_in, dtype=jnp.float32):
    std = math.sqrt(1.0 / max(1, fan_in))
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32).astype(dtype)


def kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    """torch's default Linear/Conv kernel init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) * sqrt(3)*gain.

    torch uses kaiming_uniform_(a=sqrt(5)) => gain = sqrt(2/(1+5)) = 1/sqrt(3),
    bound = gain * sqrt(3/fan_in) = 1/sqrt(fan_in).
    """
    bound = 1.0 / math.sqrt(max(1, fan_in))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound).astype(dtype)


def orthogonal(key, shape, gain=1.0, dtype=jnp.float32):
    """Orthogonal init for 2D (d_in, d_out) weights (matches torch semantics up to RNG)."""
    assert len(shape) == 2
    n_rows, n_cols = shape
    big, small = max(n_rows, n_cols), min(n_rows, n_cols)
    a = jax.random.normal(key, (big, small), jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    if n_rows < n_cols:
        q = q.T
    return (gain * q).astype(dtype)


# ---------------------------------------------------------------------------
# linear / embedding
# ---------------------------------------------------------------------------

def linear_init(key, d_in: int, d_out: int, *, bias: bool = True,
                init: str = "torch", std: float = 0.02,
                dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    if init == "torch":
        w = kaiming_uniform(kw, (d_in, d_out), d_in, dtype)
    elif init == "trunc_normal":
        w = trunc_normal(kw, (d_in, d_out), std, dtype)
    elif init == "orthogonal":
        w = orthogonal(kw, (d_in, d_out), gain=std, dtype=dtype)
    elif init == "zeros":
        w = jnp.zeros((d_in, d_out), dtype)
    else:
        raise ValueError(init)
    p: Params = {"w": w}
    if bias:
        if init == "torch":
            bound = 1.0 / math.sqrt(max(1, d_in))
            p["b"] = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound).astype(dtype)
        else:
            p["b"] = jnp.zeros((d_out,), dtype)
    return p


def linear(p: Params, x: jnp.ndarray, amax_reduce=None) -> jnp.ndarray:
    """amax_reduce: optional fn(ax) -> ax applied to the per-token activation
    absmax BEFORE quantizing on the "a8" path. Manual tensor parallelism
    (parallel/tp.py) passes lax.pmax over the tp axis for ROW-parallel
    projections, whose input is head-/intermediate-sharded: the global amax
    makes every shard's int8 codes identical to the single-device program's
    (a local amax would re-bin each shard differently — measured 5e-2
    hidden-state drift at tiny scale). Ignored by the non-a8 paths."""
    if "a8" in p:    # W8A8: dynamic per-token int8 activations (ops/quant.py)
        # the elementwise quantize stays in the input dtype: upcasting the
        # whole activation to fp32 halves the realized int8 MXU rate at
        # SAM-block shapes (164 vs 295 TFLOP/s measured on v5e, bf16 peak 86
        # — benchmarks/micro_int8_dot.py). Only the scalar-per-token scale
        # runs fp32; quant and dequant use the SAME inv/sx pair, so the only
        # extra error vs the fp32 path is sub-LSB rounding of x*inv.
        # Keep this in inline-XLA form: the quantize fuses into the PRODUCER
        # epilogue (LN / int32-scale+GELU), so the bf16 activation never
        # round-trips HBM. A Pallas quantize-only kernel (ops/int8_gemm.
        # quantize_tokens) forces that materialization and measured SLOWER
        # at every SAM-block shape (MLP 19.3 vs 10.7 ms) — see the module
        # docstring there before "optimizing" this again.
        ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        if amax_reduce is not None:
            ax = amax_reduce(ax)
        inv = (127.0 / jnp.maximum(ax.astype(jnp.float32), 1e-8)).astype(x.dtype)
        sx = 1.0 / inv.astype(jnp.float32)
        xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
        # native int8xint8->int32 MXU dot: no per-element weight dequant
        y = jax.lax.dot_general(xq, p["w_q"],
                                (((xq.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * sx * p["w_scale"]).astype(x.dtype)
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
        return y
    if "w_q" in p:   # weight-only int8 (ops/quant.py)
        y = (x @ p["w_q"].astype(x.dtype)) * p["w_scale"].astype(x.dtype)
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
        return y
    if "w_p4" in p:  # nibble-packed int4, half-pair layout (ops/int4.py)
        k2 = p["w_p4"].shape[0]
        p32 = p["w_p4"].astype(jnp.int32)
        lo = ((p32 << 28) >> 28).astype(x.dtype)
        hi = (p32 >> 4).astype(x.dtype)
        y = (x[..., :k2] @ lo + x[..., k2:] @ hi) * p["w_scale"].astype(x.dtype)
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
        return y
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def embedding_init(key, vocab: int, dim: int, *, std: float = 0.02, dtype=jnp.float32) -> Params:
    return {"w": (std * jax.random.normal(key, (vocab, dim), jnp.float32)).astype(dtype)}


def embed(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["w"], ids, axis=0)


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------

def layer_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p: Params, x: jnp.ndarray, *, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis; statistics in fp32 for bf16 safety."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm2d(p: Params, x: jnp.ndarray, *, eps: float = 1e-6) -> jnp.ndarray:
    """SAM's channel LayerNorm for NHWC feature maps (normalizes the channel axis
    with a biased variance, like segment_anything modeling/common.py LayerNorm2d,
    but in TPU-native NHWC layout)."""
    return layer_norm(p, x, eps=eps)


def rms_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(p: Params, x: jnp.ndarray, *, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# convolutions (NHWC / HWIO)
# ---------------------------------------------------------------------------

def conv2d_init(key, in_ch: int, out_ch: int, kernel: Tuple[int, int], *,
                bias: bool = True, dtype=jnp.float32) -> Params:
    kh, kw_ = kernel
    fan_in = in_ch * kh * kw_
    k1, k2 = jax.random.split(key)
    p: Params = {"w": kaiming_uniform(k1, (kh, kw_, in_ch, out_ch), fan_in, dtype)}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(k2, (out_ch,), jnp.float32, -bound, bound).astype(dtype)
    return p


def conv2d(p: Params, x: jnp.ndarray, *, stride: Tuple[int, int] = (1, 1),
           padding="SAME") -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def conv_transpose2d_init(key, in_ch: int, out_ch: int, kernel: Tuple[int, int], *,
                          bias: bool = True, dtype=jnp.float32) -> Params:
    kh, kw_ = kernel
    fan_in = in_ch * kh * kw_
    k1, k2 = jax.random.split(key)
    p: Params = {"w": kaiming_uniform(k1, (kh, kw_, in_ch, out_ch), fan_in, dtype)}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(k2, (out_ch,), jnp.float32, -bound, bound).astype(dtype)
    return p


def conv_transpose2d(p: Params, x: jnp.ndarray, *, stride: Tuple[int, int]) -> jnp.ndarray:
    """Transposed conv matching torch ConvTranspose2d semantics.

    jax.lax.conv_transpose applies the kernel unflipped (fractionally-strided
    conv); torch's ConvTranspose2d is the true conv gradient, which correlates
    with the spatially flipped kernel — so flip here. Converters then map
    torch (in, out, kh, kw) -> HWIO by pure axis transpose."""
    w = jnp.flip(p["w"], axis=(0, 1)).astype(x.dtype)
    y = jax.lax.conv_transpose(
        x, w, strides=stride, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# mlp blocks
# ---------------------------------------------------------------------------

def mlp_init(key, d_model: int, d_hidden: int, *, d_out: Optional[int] = None,
             dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, d_model, d_hidden, dtype=dtype),
        "fc2": linear_init(k2, d_hidden, d_out or d_model, dtype=dtype),
    }


def mlp(p: Params, x: jnp.ndarray, *, act=jax.nn.gelu) -> jnp.ndarray:
    return linear(p["fc2"], act(linear(p["fc1"], x)))


def relu_mlp_stack_init(key, dims: Sequence[int], dtype=jnp.float32) -> Params:
    """A torch-style MLP([d0, d1, ..., dn]) with ReLU between layers (SAM hypernets)."""
    keys = jax.random.split(key, len(dims) - 1)
    return {"layers": [linear_init(k, dims[i], dims[i + 1], dtype=dtype)
                       for i, k in enumerate(keys)]}


def relu_mlp_stack(p: Params, x: jnp.ndarray, *, sigmoid_output: bool = False) -> jnp.ndarray:
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = linear(lp, x)
        if i < n - 1:
            x = jax.nn.relu(x)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def gelu_exact(x):
    """Exact (erf) GELU — matches torch nn.GELU default; jax.nn.gelu defaults to tanh approx."""
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x):
    """Tanh-approximate GELU. ~3e-3 max abs drift vs erf in bf16 but far
    cheaper on the VPU (the erf chain costs ~5 ms per SAM-H block at batch
    16 on v5e); the encoder's fast path opts in via fast_gelu."""
    return jax.nn.gelu(x, approximate=True)


def count_params(tree) -> int:
    """Logical parameter count: nibble-packed int4 buffers (w_p4/w_p4t,
    ops/int4.py) store TWO weights per int8 element, so they count double —
    a 7B model reports 7B whether dense, int8, or int4-packed."""
    total = 0
    for path, x in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(x, "size"):
            continue
        key = path[-1]
        name = getattr(key, "key", getattr(key, "name", None))
        total += int(x.size) * (2 if name in ("w_p4", "w_p4t") else 1)
    return total


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)
