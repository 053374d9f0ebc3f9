"""Sweep the packed-window SAM attention kernel's window-group size.

Times ops.flash_attention.sam_window_attention_packed at the 1B-bench
windowed shapes (batch 16 -> 400 windows x 196 tokens, 16 heads x 80) for
WINDOW_PACKED_GROUP in {1, 2, 4, 8}, against the einsum fallback.

Run: python benchmarks/micro_win_attn.py [batch]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    from walkgpt_tpu.ops import flash_attention as fa

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    ws, h, d = 14, 16, 80
    t = ws * ws
    nwin = 25  # 64/14 -> 5x5 windows per image (ViT-H @1024)
    bw = batch * nwin
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (bw, t, 3 * h * d), jnp.bfloat16)
    rel = jax.random.normal(jax.random.PRNGKey(1), (bw, t, 2 * h * ws),
                            jnp.bfloat16)

    def timeit(fn, *args):
        out = fn(*args)
        float(jnp.sum(out))
        best = float("inf")
        win = 4
        for _ in range(3):
            t0 = time.perf_counter()
            acc = [jnp.sum(fn(*args)) for _ in range(win)]
            float(sum(acc))
            best = min(best, (time.perf_counter() - t0) / win)
        return best * 1000

    print(f"# bw={bw} t={t} h={h} d={d}")
    for wg in (1, 2, 4, 8):
        fa.WINDOW_PACKED_GROUP = wg
        f = jax.jit(lambda q, r: fa.sam_window_attention_packed(q, r, h, d, ws))
        try:
            ms = timeit(f, qkv, rel)
            print(f"packed wg={wg}      {ms:8.2f} ms")
        except Exception as e:  # VMEM overflow etc.
            print(f"packed wg={wg}      FAILED: {type(e).__name__}")
    fa.WINDOW_PACKED_GROUP = 1

    # einsum reference path at the same shapes (split heads outside)
    def einsum_attn(qkv_, rel_):
        qkv3 = qkv_.reshape(bw, t, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv3[0], qkv3[1], qkv3[2]        # [bw, h, t, d]
        rh = rel_[:, :, :h * ws].reshape(bw, t, h, ws).transpose(0, 2, 1, 3)
        rw = rel_[:, :, h * ws:].reshape(bw, t, h, ws).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k,
                       preferred_element_type=jnp.float32)
        bias = (rh[..., :, None, :, None] * 0).sum()  # placeholder-free path:
        s = s + (rh.reshape(bw, h, t, ws, 1) *
                 jnp.zeros((1,), jnp.float32)).sum(3)  # rel_h folded coarsely
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
        return o.transpose(0, 2, 1, 3).reshape(bw, t, h * d)
    ms = timeit(jax.jit(einsum_attn), qkv, rel)
    print(f"einsum (no bias)    {ms:8.2f} ms")


if __name__ == "__main__":
    main()
