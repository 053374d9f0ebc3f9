"""Microbench: is the W8A8 path actually 2x bf16 at SAM-block shapes?

Times, at the 1B-bench SAM shape (batch 16 x 4096 tokens, E=1280):
  1. bf16 dot
  2. full W8A8 path as core.nn.linear runs it (fp32 quant + int8 dot + dequant)
  3. int8 dot alone (activations pre-quantized)
  4. W8A8 with bf16-native quantize math (no fp32 upcast)
Chained x REPS inside one jitted program each (the platform adds ~6 ms per
dispatch).

Run: python benchmarks/micro_int8_dot.py [m] [k] [n]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 16 * 4096
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5120
    reps = 8

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, n), jnp.bfloat16)
    wq = jnp.asarray(rng.randint(-127, 127, (k, n)), jnp.int8)
    ws = jnp.asarray(rng.rand(n), jnp.float32) * 0.01
    xq = jnp.asarray(rng.randint(-127, 127, (m, k)), jnp.int8)

    def chain(step):
        def run(x0, *args):
            def body(c, _):
                y = step(c, *args)
                # feed a cheap mix of the output back so steps serialize
                return (x0 + y[:, :k].astype(x0.dtype) * 0).astype(x0.dtype), ()
            c, _ = jax.lax.scan(body, x0, None, length=reps)
            return c
        return jax.jit(run)

    def t(fn, *args):
        out = fn(*args); out.block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args); out.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best / reps * 1000

    flops = 2 * m * k * n

    # 1. bf16
    f1 = chain(lambda x, w: (x @ w))
    ms = t(f1, x, w)
    print(f"bf16 dot            {ms:8.3f} ms  {flops/ms/1e9:7.1f} GFLOP/s")

    # 2. full W8A8 (nn.linear semantics, fp32 quant math)
    def w8a8(x, wq, ws):
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True), 1e-8) / 127.
        xqq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(xqq, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * sx * ws).astype(x.dtype)
    f2 = chain(w8a8)
    ms = t(f2, x, wq, ws)
    print(f"w8a8 full (fp32 q)  {ms:8.3f} ms  {flops/ms/1e9:7.1f} GFLOP/s")

    # 3. int8 dot alone
    def idot(xq, wq, ws):
        y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * ws).astype(jnp.bfloat16)
    f3 = chain(idot)
    ms = t(f3, xq, wq, ws)
    print(f"int8 dot (+deq)     {ms:8.3f} ms  {flops/ms/1e9:7.1f} GFLOP/s")

    # 4. W8A8 with bf16-native quant math
    def w8a8_bf16(x, wq, ws):
        sx = (jnp.maximum(jnp.max(jnp.abs(x), -1, keepdims=True),
                          jnp.bfloat16(1e-6)) / 127.).astype(jnp.bfloat16)
        xqq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(xqq, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * sx.astype(jnp.float32) * ws
                ).astype(x.dtype)
    f4 = chain(w8a8_bf16)
    ms = t(f4, x, wq, ws)
    print(f"w8a8 full (bf16 q)  {ms:8.3f} ms  {flops/ms/1e9:7.1f} GFLOP/s")


if __name__ == "__main__":
    main()
