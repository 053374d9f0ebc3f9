"""A/B the packed-window kernel's head-slice alignment hypothesis.

The production kernel (_win_packed_fwd_kernel) slices q/k/v per head at lane
offsets hh*80 — misaligned with the 128-lane registers, so Mosaic realigns
every extract. This variant consumes a [BW, T, 3*H*128] zero-padded layout
(aligned slices) and is otherwise identical. If the aligned kernel is much
faster, repacking qkv after the GEMM (~2 ms/block of HBM copies) pays for
itself; if not, alignment is not where the time goes.

MEASURED (v5e, batch 16, 2026-08-19): 14.07 ms production vs 14.08 ms
aligned — alignment is NOT the cost. Together with the wg sweep
(micro_win_attn.py: wg=2 no better, so per-program overhead isn't either),
the kernel sits at its practical floor: VPU softmax over 246M logits plus
196-token dots that pad to 224x256 MXU tiles.

Run: python benchmarks/micro_win_aligned.py [batch]
"""
from __future__ import annotations

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    from walkgpt_tpu.ops import flash_attention as fa

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    ws, h, d, dp = 14, 16, 80, 128
    t = ws * ws
    bw = batch * 25
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (bw, t, 3 * h * d), jnp.bfloat16)
    rel = jax.random.normal(jax.random.PRNGKey(1), (bw, t, 2 * h * ws),
                            jnp.bfloat16)
    # aligned layout: each head slot padded 80 -> 128 lanes
    qkv_pad = qkv.reshape(bw, t, 3 * h, d)
    qkv_pad = jnp.pad(qkv_pad, ((0, 0), (0, 0), (0, 0), (0, dp - d))
                      ).reshape(bw, t, 3 * h * dp)

    def aligned_kernel(qkv_ref, rel_ref, o_ref, *, scale):
        e_r, e_w = fa._win_expansions(ws, t)
        c = h * dp
        for hh in range(h):
            q = qkv_ref[:, :, hh * dp:hh * dp + dp]
            k = qkv_ref[:, :, c + hh * dp:c + hh * dp + dp]
            v = qkv_ref[:, :, 2 * c + hh * dp:2 * c + hh * dp + dp]
            rh = rel_ref[:, :, hh * ws:(hh + 1) * ws]
            rw = rel_ref[:, :, (h + hh) * ws:(h + hh + 1) * ws]
            s = jax.lax.dot_general(q * jnp.asarray(scale, q.dtype), k,
                                    (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            s = s + fa._win_bias(rh, rw, e_r, e_w, 1, t, ws)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            o_ref[:, :, hh * dp:hh * dp + dp] = (
                o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    blk = lambda i: (i, 0, 0)
    def aligned(qkv_pad, rel):
        return pl.pallas_call(
            functools.partial(aligned_kernel, scale=1.0 / math.sqrt(d)),
            grid=(bw,),
            in_specs=[
                pl.BlockSpec((1, t, 3 * h * dp), blk,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t, 2 * h * ws), blk,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, t, h * dp), blk,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bw, t, h * dp), qkv_pad.dtype),
        )(qkv_pad, rel)

    def timeit(fn, *args):
        out = fn(*args)
        float(jnp.sum(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = [jnp.sum(fn(*args)) for _ in range(4)]
            float(sum(acc))
            best = min(best, (time.perf_counter() - t0) / 4)
        return best * 1000

    base = timeit(jax.jit(lambda a, b: fa.sam_window_attention_packed(
        a, b, h, d, ws)), qkv, rel)
    print(f"packed d=80 (production)  {base:7.2f} ms", flush=True)
    al = timeit(jax.jit(aligned), qkv_pad, rel)
    print(f"aligned d=128 variant     {al:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
