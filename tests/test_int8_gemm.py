"""Unit tests for the one-launch Pallas W8A8 GEMM (ops/int8_gemm.py).

f32 inputs give bit-exact parity with the core.nn.linear "a8" formula (no
bf16 tie rounding involved); bf16 inputs are compared with a one-int8-LSB
tolerance because Pallas interpret mode stores bf16 refs as f32 and skips
the product rounding that hardware and the XLA path perform (see kernel
comment).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from walkgpt_tpu.core import nn
from walkgpt_tpu.ops.int8_gemm import fits_vmem, w8a8_gemm


def _xla_w8a8(x, wq, ws, b=None):
    ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    inv = (127.0 / jnp.maximum(ax.astype(jnp.float32), 1e-8)).astype(x.dtype)
    sx = 1.0 / inv.astype(jnp.float32)
    xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * ws
    if b is not None:
        y = y + b
    return y


def _mk(m, k, n, dtype, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(m, k), dtype)
    wq = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)
    ws = jnp.asarray(rng.rand(n).astype(np.float32) * 0.01 + 1e-3)
    b = jnp.asarray(rng.randn(n).astype(np.float32) * 0.1)
    return x, wq, ws, b


def test_f32_exact_no_bias():
    x, wq, ws, _ = _mk(260, 256, 384, jnp.float32)   # M=260 exercises padding
    got = w8a8_gemm(x, wq, ws)
    ref = _xla_w8a8(x, wq, ws).astype(jnp.float32)
    # quant decisions are identical for f32 inputs; the epilogue multiply
    # order differs (fma/association), so exact to f32 rounding only
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_f32_exact_bias_and_gelu():
    x, wq, ws, b = _mk(128, 256, 384, jnp.float32)
    got = w8a8_gemm(x, wq, ws, b, act="gelu_tanh")
    ref = nn.gelu_tanh(_xla_w8a8(x, wq, ws, b)).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_bf16_one_lsb_tolerance():
    x, wq, ws, _ = _mk(256, 256, 384, jnp.bfloat16)
    got = np.asarray(w8a8_gemm(x, wq, ws), np.float32)
    ref = np.asarray(_xla_w8a8(x, wq, ws), np.float32)
    # interpret mode flips ~9% of round-half ties vs the XLA path (kernel
    # docstring); each flip moves y_j by wq[k,j]*sx*ws_j, so compare at
    # quantization-noise scale relative to the row magnitude
    row = np.max(np.abs(ref), axis=-1, keepdims=True)
    assert np.all(np.abs(got - ref) <= 0.025 * row + 1e-3)


def test_lead_dims_roundtrip():
    x, wq, ws, _ = _mk(2 * 130, 128, 256, jnp.float32)
    x3 = x.reshape(2, 130, 128)
    got = w8a8_gemm(x3, wq, ws)
    assert got.shape == (2, 130, 256)
    flat = w8a8_gemm(x, wq, ws)
    np.testing.assert_array_equal(np.asarray(got).reshape(-1, 256),
                                  np.asarray(flat))


def test_matches_nn_linear_a8_branch():
    # nn.linear keeps the XLA w8a8 formulation (the Pallas kernel is a
    # recorded negative result — module docstring); hold numeric parity so
    # the experiment stays a drop-in for A/Bs
    x, wq, ws, b = _mk(1024, 128, 128, jnp.float32)
    p = {"w_q": wq, "w_scale": ws, "b": b, "a8": True}
    got = w8a8_gemm(x, wq, ws, b)
    ref = np.asarray(nn.linear(p, x), np.float32)
    np.testing.assert_allclose(np.asarray(got, np.float32), ref, rtol=1e-6,
                               atol=1e-6)


def test_fused_gelu_matches_nn_mlp():
    rng = np.random.RandomState(1)
    m, d, h = 1024, 128, 256
    x = jnp.asarray(rng.randn(m, d), jnp.float32)
    fc1 = {"w_q": jnp.asarray(rng.randint(-127, 128, (d, h)), jnp.int8),
           "w_scale": jnp.asarray(rng.rand(h).astype(np.float32) * 0.01),
           "a8": True}
    fc2 = {"w_q": jnp.asarray(rng.randint(-127, 128, (h, d)), jnp.int8),
           "w_scale": jnp.asarray(rng.rand(d).astype(np.float32) * 0.01),
           "a8": True}
    ref = np.asarray(nn.mlp({"fc1": fc1, "fc2": fc2}, x, act=nn.gelu_tanh),
                     np.float32)
    h_got = w8a8_gemm(x, fc1["w_q"], fc1["w_scale"], act="gelu_tanh")
    got = w8a8_gemm(h_got, fc2["w_q"], fc2["w_scale"])
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               rtol=1e-5, atol=1e-5)


def test_quantize_tokens_f32_exact():
    from walkgpt_tpu.ops.int8_gemm import quantize_tokens
    x, _, _, _ = _mk(300, 256, 1, jnp.float32)    # M=300 exercises padding
    xq, sx = quantize_tokens(x)
    ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    inv = 127.0 / jnp.maximum(ax, 1e-8)
    ref_q = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(xq), np.asarray(ref_q))
    np.testing.assert_allclose(np.asarray(sx), np.asarray(1.0 / inv),
                               rtol=3e-7)   # double-reciprocal f32 rounding
    assert xq.dtype == jnp.int8 and sx.dtype == jnp.float32


def test_quantize_tokens_bf16_and_lead_dims():
    from walkgpt_tpu.ops.int8_gemm import quantize_tokens
    x, _, _, _ = _mk(4 * 128, 384, 1, jnp.bfloat16)
    xq, sx = quantize_tokens(x.reshape(4, 128, 384))
    assert xq.shape == (4, 128, 384) and sx.shape == (4, 128, 1)
    ax = np.max(np.abs(np.asarray(x, np.float32)), -1)
    # interpret mode can flip round-half ties by one LSB (kernel docstring);
    # compare dequantized values at quant-step scale
    deq = np.asarray(xq, np.float32).reshape(512, 384) * np.asarray(
        sx, np.float32).reshape(512, 1)
    assert np.all(np.abs(deq - np.asarray(x, np.float32))
                  <= (ax / 127.0 * 1.01 + 1e-6)[:, None])


def test_quantize_tokens_matches_nn_linear_quant_decisions():
    # nn.linear keeps the inline-XLA quantize (the kernel is a recorded
    # negative result — module docstring); hold numeric parity so the
    # experiment stays a valid drop-in for A/Bs
    x, wq, ws, b = _mk(1024, 128, 128, jnp.float32)
    from walkgpt_tpu.ops.int8_gemm import quantize_tokens
    xq, sx = quantize_tokens(x)
    y = np.asarray(xq, np.float32) @ np.asarray(wq, np.float32)
    got = y * np.asarray(sx) * np.asarray(ws) + np.asarray(b)
    p = {"w_q": wq, "w_scale": ws, "b": b, "a8": True}
    ref = np.asarray(nn.linear(p, x), np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fits_vmem_covers_model_shapes():
    assert fits_vmem(1280, 3840)    # SAM qkv
    assert fits_vmem(1280, 5120)    # SAM fc1
    assert fits_vmem(5120, 1280)    # SAM fc2
    assert fits_vmem(8192, 28672)   # 7B-MLP-scale panel tiles over N
    assert not fits_vmem(200_000, 128)   # K alone overflows the budget


def test_n_tiled_grid_matches_single_panel(monkeypatch):
    import walkgpt_tpu.ops.int8_gemm as mod
    x, wq, ws, b = _mk(256, 128, 512, jnp.float32)
    whole = w8a8_gemm(x, wq, ws, b)
    # shrink the budget so the same shape is forced onto an N-tiled grid
    monkeypatch.setattr(mod, "_VMEM_BUDGET", 300 * 1024)
    assert mod._pick_bn(128, 512, 128) not in (None, 512)
    tiled = mod.w8a8_gemm(x, wq, ws, b)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(tiled))
