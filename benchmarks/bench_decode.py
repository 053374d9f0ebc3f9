"""Decode-loop micro-benchmark at 7B/13B scale on the real TPU.

Times `greedy_generate` (prefill + N decode steps, ONE jitted program) with
random prompt embeddings — no SAM encode — across weight-quant x KV-cache
combos, to attribute e2e bench movements to the decode engine. Per-step time
= (total - prefill_estimate) / steps is NOT reported; we report whole-program
img/s-equivalent and ms/step upper bound (total/steps), which is what the
e2e pipeline actually pays.

Run: python benchmarks/bench_decode.py [model] [batch] [steps] [combo ...]
  combo: quant:kv  e.g.  int8:none int8:int8_flat w8a8:none w8a8:int8_flat
Defaults: 7b 8 64, all four combos.
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
    from walkgpt_tpu.core import nn
    from walkgpt_tpu.core.config import (walkgpt_7b_config, walkgpt_13b_config,
                                         flagship_1b_config)
    from walkgpt_tpu.models import walkgpt, llm
    from walkgpt_tpu.ops import quant as quant_lib
    from walkgpt_tpu.runtime.generate import greedy_generate

    model = sys.argv[1] if len(sys.argv) > 1 else "7b"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    combos = sys.argv[4:] or ["int8:none", "int8:int8_flat",
                              "w8a8:none", "w8a8:int8_flat"]

    cfg_fn = {"7b": walkgpt_7b_config, "13b": walkgpt_13b_config,
              "1b": flagship_1b_config}[model]
    full = cfg_fn(seg_token_id=32000)
    lcfg = full.llm
    t_prompt = 400
    dtype = jnp.bfloat16

    def llm_params(q: str):
        key = jax.random.PRNGKey(0)
        return quant_lib.quantized_llm_init(
            key, lcfg, dtype,
            act_quant=q in ("w8a8", "int4", "int4x"),
            mlp_int4=q in ("int4", "int4x"),
            attn_int4=q == "int4x", head_int4=q == "int4x")

    params_cache = {}
    for combo in combos:
        q, kv = combo.split(":")
        if q not in params_cache:
            params_cache[q] = llm_params(q)
        params = params_cache[q]
        emb = jax.random.normal(jax.random.PRNGKey(1),
                                (batch, t_prompt, lcfg.hidden_size), dtype)
        mask = jnp.ones((batch, t_prompt), bool)
        kvq = "" if kv == "none" else kv

        def run(params, emb, mask):
            # production prefill path (walkgpt.model_forward): Pallas flash
            # attention — naive MHA materializes f32 [B, H, T, T] score
            # temps (500 MB at 7B batch 20 / 400 tokens) and OOMs configs
            # the real pipeline runs fine
            from walkgpt_tpu.ops.flash_attention import flash_attention
            flash_fn = lambda q, k, v, kv: flash_attention(q, k, v, True,
                                                           key_valid=kv)
            r = greedy_generate(params, lcfg, emb, mask,
                                max_new_tokens=steps, eos_id=-1,
                                kv_quant=kvq, flash_fn=flash_fn)
            return r.tokens

        # production compile options (core/xla_opts): the stock remat pass
        # collapses 512-trip quantized-cache scans (51.8 ms/step with it vs
        # 18.2 in the identical-options e2e program, 7B batch 20 2026-08-18)
        from walkgpt_tpu.core.xla_opts import decode_compiler_options
        fn = jax.jit(run, compiler_options=decode_compiler_options())
        out = fn(params, emb, mask)
        int(out.sum())                       # compile + flush
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = 0
            for _ in range(2):
                acc = acc + fn(params, emb, mask).sum()
            int(acc)
            best = min(best, (time.perf_counter() - t0) / 2)
        print(f"{model} batch={batch} steps={steps} {combo:18s} "
              f"total={best*1000:8.1f} ms  ={best/steps*1000:6.2f} ms/step "
              f"(incl. prefill)", flush=True)


if __name__ == "__main__":
    main()
