"""In-scan ablation of the 7B decode step on the real TPU.

The per-step cost attribution cannot come from separately-jitted stages
(this platform pays ~5.7 ms dispatch per program) or from traces (no
xplane reader in the image). Instead: run the SAME 256-trip lax.scan with
individual decode-step components knocked out, all inside one jit each,
and difference the totals. Variants:

  full        — llm.decode_step verbatim (production path)
  read0       — cache quantize+write happen, attention output forced to
                zeros and the cache READ + softmax elided
  write0      — attention elided entirely (no quantize/scatter either)
  mlp0        — MLP replaced by zeros
  qkvo_only   — attention elided AND MLP elided (qkv/o projections + norms
                + rope + embed/head remain)

  attention read+softmax  = full - read0
  cache quantize + write  = read0 - write0
  MLP (incl int4 kernel)  = full - mlp0

Run: python benchmarks/ablate_decode.py [model] [batch] [steps] [kv]
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
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from walkgpt_tpu.core.config import (walkgpt_7b_config, walkgpt_13b_config,
                                         flagship_1b_config)
    from walkgpt_tpu.core import nn
    from walkgpt_tpu.models import llm
    from walkgpt_tpu.ops import quant as quant_lib
    from walkgpt_tpu.core.xla_opts import decode_compiler_options

    model = sys.argv[1] if len(sys.argv) > 1 else "7b"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    kv = sys.argv[4] if len(sys.argv) > 4 else "int8"
    cfg = {"7b": walkgpt_7b_config, "13b": walkgpt_13b_config,
           "1b": flagship_1b_config}[model]().llm
    dtype = jnp.bfloat16
    t_prompt = 400
    max_len = t_prompt + steps + 112          # ~908-slot production cache

    params = quant_lib.quantized_llm_init(
        jax.random.PRNGKey(0), cfg, dtype, act_quant=True, mlp_int4=True,
        attn_int4=True, head_int4=True)

    from walkgpt_tpu.models.llm import (_norm, _qkv_proj, _mlp, _quant_rows,
                                        rope_tables, apply_rope)
    from walkgpt_tpu.ops.attention import merge_heads, split_heads

    def step_fn(variant):
        do_attn = variant in ("full", "mlp0")
        do_read = do_attn
        do_write = variant in ("full", "mlp0", "read0")
        do_mlp = variant in ("full", "read0", "write0")

        def step(params, carry, s):
            kv_cache, tok, cache_len = carry
            x = llm.embed(params, tok)[:, None].astype(dtype)
            out_cache = dict(kv_cache)
            b = x.shape[0]
            positions = cache_len[:, None]
            rot_dim = int(cfg.head_dim * cfg.rope_pct)
            cos, sin = rope_tables(cfg, positions)
            key_pos = jnp.arange(max_len, dtype=jnp.int32)[None]
            key_mask = key_pos <= (t_prompt + s)
            key_mask = jnp.broadcast_to(key_mask, (b, max_len))
            write_slot = t_prompt + s
            for i, layer in enumerate(params["layers"]):
                h_in = _norm(layer["input_norm"], x, cfg)
                qp, kp, vp = _qkv_proj(layer["attn"], h_in, cfg)
                q = split_heads(qp, cfg.num_heads)
                k1 = split_heads(kp, cfg.num_kv_heads)
                v1 = split_heads(vp, cfg.num_kv_heads)
                q = apply_rope(q, cos, sin, rot_dim)
                k1 = apply_rope(k1, cos, sin, rot_dim)
                if do_write:
                    kq, ksc = _quant_rows(k1[:, :, 0], jnp.int8)
                    vq, vsc = _quant_rows(v1[:, :, 0], jnp.int8)
                    out_cache["k"] = jax.lax.dynamic_update_slice(
                        out_cache["k"], kq[None, :, :, None],
                        (i, 0, 0, write_slot, 0))
                    out_cache["v"] = jax.lax.dynamic_update_slice(
                        out_cache["v"], vq[None, :, :, None],
                        (i, 0, 0, write_slot, 0))
                    out_cache["k_scale"] = jax.lax.dynamic_update_slice(
                        out_cache["k_scale"], ksc[None].astype(jnp.bfloat16),
                        (i, 0, 0, write_slot))
                    out_cache["v_scale"] = jax.lax.dynamic_update_slice(
                        out_cache["v_scale"], vsc[None].astype(jnp.bfloat16),
                        (i, 0, 0, write_slot))
                if do_read:
                    att = llm._int8_kv_decode_attention(
                        q, out_cache["k"][i], out_cache["k_scale"][i],
                        out_cache["v"][i], out_cache["v_scale"][i], key_mask)
                else:
                    att = jnp.zeros_like(q)
                x = x + nn.linear(layer["attn"]["o"], merge_heads(att))
                if do_mlp:
                    x = x + _mlp(layer["mlp"],
                                 _norm(layer["post_norm"], x, cfg), cfg)
                else:
                    x = x + _norm(layer["post_norm"], x, cfg) * 0.0
            hid = _norm(params["final_norm"], x, cfg)
            logits = llm.lm_logits(params, cfg, hid[:, 0]).astype(jnp.float32)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (out_cache, nxt, cache_len + 1), nxt

        def run(params, kv0, tok0):
            import functools
            carry = (kv0, tok0, jnp.full((batch,), t_prompt, jnp.int32))
            carry, toks = jax.lax.scan(functools.partial(step, params), carry,
                                       jnp.arange(steps, dtype=jnp.int32))
            return toks

        return run

    kv0 = llm.init_kv_cache(cfg, batch, max_len, dtype=dtype, quant=kv,
                            layout="heads")
    tok0 = jnp.zeros((batch,), jnp.int32)
    results = {}
    for variant in ["full", "read0", "write0", "mlp0", "qkvo_only"]:
        fn = jax.jit(step_fn(variant),
                     compiler_options=decode_compiler_options())
        try:
            toks = fn(params, kv0, tok0)
            int(toks.sum())
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                toks = fn(params, kv0, tok0)
                int(toks.sum())
                best = min(best, time.perf_counter() - t0)
            results[variant] = best * 1000 / steps
            print(f"{model} b={batch} {variant:10s}  {best*1000:8.1f} ms "
                  f"= {best*1000/steps:6.2f} ms/step", flush=True)
        except Exception as e:                          # pragma: no cover
            print(f"{variant}: FAILED {type(e).__name__}: {e}", flush=True)
    if "full" in results and "read0" in results:
        print(f"attention read+softmax : "
              f"{results['full']-results['read0']:6.2f} ms/step")
    if "read0" in results and "write0" in results:
        print(f"cache quantize+write   : "
              f"{results['read0']-results['write0']:6.2f} ms/step")
    if "full" in results and "mlp0" in results:
        print(f"MLP                    : "
              f"{results['full']-results['mlp0']:6.2f} ms/step")
    if "qkvo_only" in results:
        print(f"qkv/o+norms+rope+head  : {results['qkvo_only']:6.2f} ms/step")


if __name__ == "__main__":
    main()
