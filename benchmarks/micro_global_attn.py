"""Microbench the SAM global flash kernel (rel-pos bias) on the real TPU.

Sweeps (bq, bk) tile shapes and compares against a plain-XLA attention with
the bias materialized, at the production shape: batch 16, 16 heads, 64x64
grid, D=80. Chains reps inside one jitted scan and syncs with a host
readback (the tunneled platform's block_until_ready returns early).

Run: python benchmarks/micro_global_attn.py [batch] [reps]
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
    from walkgpt_tpu.ops.flash_attention import sam_flash_attention

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    h, d, gh, gw = 16, 80, 64, 64
    n = gh * gw
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(batch, h, n, d), dtype)
    k = jnp.asarray(rng.randn(batch, h, n, d), dtype)
    v = jnp.asarray(rng.randn(batch, h, n, d), dtype)
    rel_h = jnp.asarray(rng.randn(batch, h, n, gh) * 0.1, dtype)
    rel_w = jnp.asarray(rng.randn(batch, h, n, gw) * 0.1, dtype)

    def chain(fn):
        def run(q, k, v, rh, rw):
            def body(c, _):
                o = fn(c, k, v, rh, rw)
                return o.astype(c.dtype), ()
            c, _ = jax.lax.scan(body, q, None, length=reps)
            return c
        return jax.jit(run)

    def t(fn):
        f = chain(fn)
        out = f(q, k, v, rel_h, rel_w)
        float(jnp.sum(out))                     # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(q, k, v, rel_h, rel_w)
            float(jnp.sum(out))
            best = min(best, (time.perf_counter() - t0) / reps)
        return best * 1e3

    flops = 2 * 2 * batch * h * n * n * d       # QK + PV only
    for bq in (256, 512):
        for bk in (512, 1024, 2048):
            ms = t(lambda q, k, v, rh, rw, bq=bq, bk=bk: sam_flash_attention(
                q, k, v, rh, rw, (gh, gw), bq, bk))
            print(f"flash bq={bq:4d} bk={bk:4d}   {ms:7.2f} ms  "
                  f"({flops / ms / 1e9:6.1f} TF/s eff)", flush=True)

    def xla_attn(q, k, v, rh, rw):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        s = s / np.sqrt(d)
        bias = (rh.reshape(batch, h, n, gh, 1).astype(jnp.float32)
                + rw.reshape(batch, h, n, 1, gw).astype(jnp.float32)
                ).reshape(batch, h, n, n)
        p = jax.nn.softmax(s + bias, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

    ms = t(xla_attn)
    print(f"xla materialized bias  {ms:7.2f} ms  "
          f"({flops / ms / 1e9:6.1f} TF/s eff)", flush=True)


if __name__ == "__main__":
    main()
