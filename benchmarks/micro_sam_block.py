"""Microbench one SAM ViT-H windowed block at the 1B-bench batch (16).

Times the real models/sam_encoder._block (quantized vs bf16) and its pieces
chained x8 inside one jitted program, to locate where the 30 ms/block goes.

Run: python benchmarks/micro_sam_block.py [batch]
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
    from walkgpt_tpu.core import nn
    from walkgpt_tpu.core.config import SAMEncoderConfig
    from walkgpt_tpu.models import sam_encoder
    from walkgpt_tpu.ops.quant import quantize_sam_encoder

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from walkgpt_tpu.core.config import SAM_VIT_H
    cfg = SAM_VIT_H
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    params = sam_encoder.init(key, cfg, dtype)
    blk = params["blocks"][0]
    wrap = {"image_encoder": {"blocks": [blk]}}
    qblk = quantize_sam_encoder(wrap, act_quant=True)["image_encoder"]["blocks"][0]
    woblk = quantize_sam_encoder(wrap, act_quant=False)["image_encoder"]["blocks"][0]

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (batch, cfg.grid, cfg.grid, cfg.embed_dim), dtype)
    reps = 8

    def chain(fn):
        def run(x0, p):
            def body(c, _):
                y = fn(p, c)
                return y.astype(c.dtype), ()
            c, _ = jax.lax.scan(body, x0, None, length=reps)
            return c
        return jax.jit(run)

    def t(fn, *args):
        # block_until_ready() returns before execution completes on the
        # tunneled platform (see bench.py); a host readback is the only
        # reliable sync, so time windows of calls ended by one readback.
        out = fn(*args)
        float(jnp.sum(out))            # warm + compile
        best = float("inf")
        win = 2
        for _ in range(3):
            t0 = time.perf_counter()
            acc = [jnp.sum(fn(*args)) for _ in range(win)]
            float(sum(acc))
            best = min(best, (time.perf_counter() - t0) / win)
        return best / reps * 1000

    def block(p, c):
        return sam_encoder._block(p, c, cfg, cfg.window_size, True, True, True)

    for name, p in (("bf16", blk), ("w8-only", woblk), ("w8a8", qblk)):
        ms = t(chain(block), x, p)
        print(f"block {name:8s}      {ms:8.2f} ms")

    # pieces (windowed shapes): fold windows like _block does
    from walkgpt_tpu.ops.attention import window_partition
    xw, _ = window_partition(nn.layer_norm(blk["ln1"], x), cfg.window_size)
    bw, h, w, c = xw.shape
    xflat = xw.reshape(bw, h * w, c)
    print(f"# windowed tokens: {bw}x{h*w}")

    for name, p in (("bf16", blk), ("w8a8", qblk)):
        ms = t(chain(lambda p_, c_: nn.linear(
            p_["qkv"], c_)[..., :c].astype(c_.dtype)), xflat, p)
        print(f"qkv {name:8s}        {ms:8.2f} ms")
        ms = t(chain(lambda p_, c_: nn.mlp(
            p_["mlp"], c_, act=nn.gelu_tanh)), xflat, p)
        print(f"mlp {name:8s}        {ms:8.2f} ms")

    def attn(p, c):
        return sam_encoder._attention(p, c, cfg.num_heads, cfg.use_rel_pos,
                                      use_flash=True, fast=True, windowed=True)
    ms = t(chain(attn), xw, blk)
    print(f"attention(+qkv+proj)  {ms:8.2f} ms")


if __name__ == "__main__":
    main()
