"""Micro-profile of the SAM ViT-H encoder sub-stages on the real TPU.

Times patch-embed, a single windowed block, a single global block, and the
neck at the bench configuration, plus the windowed block's internals
(qkv/rel-proj/kernel/proj/mlp), to target the next encoder optimization.

Run: python benchmarks/profile_sam.py [batch]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=5, force=lambda o: None):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    import jax
    import jax.numpy as jnp
    from walkgpt_tpu.core.config import SAM_VIT_H
    from walkgpt_tpu.models import sam_encoder
    from walkgpt_tpu.core import nn
    from walkgpt_tpu.ops.attention import window_partition, window_unpartition, \
        split_heads

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = SAM_VIT_H
    dtype = jnp.bfloat16
    params = sam_encoder.init(jax.random.PRNGKey(0), cfg, dtype=dtype)
    rng = np.random.RandomState(0)
    s = cfg.img_size
    images = jnp.asarray(rng.randn(batch, s, s, 3), dtype)
    g = cfg.grid
    x = jnp.asarray(rng.randn(batch, g, g, cfg.embed_dim), dtype)

    # full encode
    full = jax.jit(lambda p, im: sam_encoder.apply(
        p, cfg, im, use_flash=True, fast_windowed=True))
    t_full, _ = timeit(full, params, images, iters=3,
                       force=lambda o: float(o.sum()))
    print(f"full encode       {t_full*1e3:8.1f} ms  (batch {batch})")

    # patch embed + pos
    pe = jax.jit(lambda p, im: nn.conv2d(p["patch_embed"], im,
                 stride=(cfg.patch_size, cfg.patch_size), padding="VALID")
                 + p["pos_embed"].astype(dtype))
    t_pe, _ = timeit(pe, params, images, force=lambda o: float(o.sum()))
    print(f"patch embed       {t_pe*1e3:8.1f} ms")

    # one windowed block / one global block
    blk_w = params["blocks"][0]
    blk_g = params["blocks"][cfg.global_attn_indexes[0]]
    fw = jax.jit(lambda p, x: sam_encoder._block(p, x, cfg, cfg.window_size,
                                                 True, True))
    t_w, _ = timeit(fw, blk_w, x, force=lambda o: float(o.sum()))
    n_w = cfg.depth - len(cfg.global_attn_indexes)
    print(f"windowed block    {t_w*1e3:8.1f} ms  x{n_w} = {t_w*n_w*1e3:.0f} ms")
    fg = jax.jit(lambda p, x: sam_encoder._block(p, x, cfg, 0, True, True))
    t_g, _ = timeit(fg, blk_g, x, force=lambda o: float(o.sum()))
    n_g = len(cfg.global_attn_indexes)
    print(f"global block      {t_g*1e3:8.1f} ms  x{n_g} = {t_g*n_g*1e3:.0f} ms")

    # neck
    def neck(p, x):
        n = p["neck"]
        y = x.astype(jnp.float32)
        y = nn.conv2d({k: v.astype(jnp.float32) for k, v in n["conv1"].items()},
                      y, padding="VALID")
        y = nn.layer_norm2d(n["ln1"], y)
        y = nn.conv2d({k: v.astype(jnp.float32) for k, v in n["conv2"].items()},
                      y, padding="SAME")
        y = nn.layer_norm2d(n["ln2"], y)
        return y.astype(dtype)
    fn_neck = jax.jit(neck)
    t_n, _ = timeit(fn_neck, params, x, force=lambda o: float(o.sum()))
    print(f"neck              {t_n*1e3:8.1f} ms")

    est = t_pe + n_w * t_w + n_g * t_g + t_n
    print(f"sum of stages     {est*1e3:8.1f} ms (vs full {t_full*1e3:.0f})")

    # ---- windowed block internals
    win = cfg.window_size
    xw, pad_hw = window_partition(x, win)     # [B*nw, win, win, C]
    bw = xw.shape[0]
    print(f"-- windowed internals: {bw} windows of {win}x{win}")

    f_qkv = jax.jit(lambda p, xw: nn.linear(
        p["qkv"], xw.reshape(bw, win * win, cfg.embed_dim)))
    t_qkv, qkv = timeit(f_qkv, blk_w, xw, force=lambda o: float(o.sum()))
    print(f"   qkv proj        {t_qkv*1e3:7.1f} ms")

    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (split_heads(t, cfg.num_heads) for t in (q, k, v))

    f_rel = jax.jit(lambda p, q: sam_encoder._rel_projections(
        q, p["rel_pos_h"], p["rel_pos_w"], win, win))
    t_rel, (rel_h, rel_w) = timeit(f_rel, blk_w, q,
                                   force=lambda o: float(o[0].sum()))
    print(f"   rel projections {t_rel*1e3:7.1f} ms")

    from walkgpt_tpu.ops.flash_attention import sam_window_attention
    f_att = jax.jit(lambda q, k, v, rh, rw: sam_window_attention(
        q, k, v, rh.astype(q.dtype), rw.astype(q.dtype), win))
    t_att, _ = timeit(f_att, q, k, v, rel_h, rel_w,
                      force=lambda o: float(o.sum()))
    print(f"   window kernel   {t_att*1e3:7.1f} ms")

    f_proj = jax.jit(lambda p, xw: nn.linear(
        p["proj"], xw.reshape(bw, win * win, cfg.embed_dim)))
    t_pr, _ = timeit(f_proj, blk_w, xw, force=lambda o: float(o.sum()))
    print(f"   out proj        {t_pr*1e3:7.1f} ms")

    f_mlp = jax.jit(lambda p, x: nn.mlp(p["mlp"], nn.layer_norm(p["ln2"], x),
                                        act=nn.gelu_exact))
    t_mlp, _ = timeit(f_mlp, blk_w, x, force=lambda o: float(o.sum()))
    print(f"   ln2+mlp         {t_mlp*1e3:7.1f} ms")

    f_ln = jax.jit(lambda p, x: nn.layer_norm(p["ln1"], x))
    t_ln, _ = timeit(f_ln, blk_w, x, force=lambda o: float(o.sum()))
    print(f"   ln1             {t_ln*1e3:7.1f} ms")

    f_wp = jax.jit(lambda x: window_partition(x, win)[0])
    t_wp, _ = timeit(f_wp, x, force=lambda o: float(o.sum()))
    print(f"   window part.    {t_wp*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
