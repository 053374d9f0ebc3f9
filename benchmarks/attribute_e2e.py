"""Attribute e2e bench time across pipeline phases (one process, real TPU).

Times, as separate jitted programs with host readbacks:
  1. SAM-H encode + MSQP (once per batch)
  2. prefill + 1 decode step (greedy_generate max_new=1)
  3. prefill + 1+N decode steps -> decode slope = (t3 - t2) / N
Run: python benchmarks/attribute_e2e.py [model] [batch] [N]
Env: A_QUANT (default int4x), A_KV (default int8), A_TOKENIZER prompt len fixed.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax_flush(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax_flush(out)
        best = min(best, time.perf_counter() - t0)
    return best


def jax_flush(out):
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    float(leaves[0].sum())


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from walkgpt_tpu.core.config import (walkgpt_7b_config, walkgpt_13b_config,
                                         flagship_1b_config)
    from walkgpt_tpu.models import walkgpt, sam
    from walkgpt_tpu.models.walkgpt import sam_config
    from walkgpt_tpu.runtime.generate import greedy_generate

    model = sys.argv[1] if len(sys.argv) > 1 else "7b"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    quant = os.environ.get("A_QUANT", "int4x")
    kv = os.environ.get("A_KV", "int8")

    cfg_fn = {"7b": walkgpt_7b_config, "13b": walkgpt_13b_config,
              "1b": flagship_1b_config}[model]
    cfg = cfg_fn(seg_token_id=32000)
    cfg = dataclasses.replace(cfg, clip=None, fast_windowed_attention=True,
                              fast_gelu=True,
                              kv_quant_cache=kv if kv else False,
                              decode_cache_grow=int(
                                  os.environ.get("A_GROW", "0")))
    dtype = jnp.bfloat16
    if quant:
        params = walkgpt.init_quantized(
            jax.random.PRNGKey(0), cfg, dtype,
            act_quant=quant in ("w8a8", "int4", "int4x"),
            mlp_int4=quant in ("int4", "int4x"),
            attn_int4=quant == "int4x", head_int4=quant == "int4x",
            sam_int8=os.environ.get("A_SAM", "") == "int8")
    else:
        params = walkgpt.init(jax.random.PRNGKey(0), cfg, dtype=dtype)
    print(f"# init done: {model} batch={batch} quant={quant} kv={kv}",
          flush=True)

    s = cfg.sam.img_size
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, s, s, 3), dtype)
    skip_parts = os.environ.get("A_PARTS", "1") == "0"

    # --- 1. SAM encode ---
    @jax.jit
    def encode(params, images):
        return sam.encode_image(params["sam"], sam_config(cfg), images,
                                use_flash=cfg.use_flash_attention,
                                fast_windowed=cfg.fast_windowed_attention,
                                fast_gelu=cfg.fast_gelu)

    if not skip_parts:
        t_enc = timeit(encode, params, images)
        print(f"sam_encode            {t_enc*1000:9.1f} ms/batch{batch}",
              flush=True)

    # --- 2/3. prefill + decode slope through the LLM only ---
    t_prompt = int(os.environ.get("A_TPROMPT", "400"))
    lcfg = cfg.llm
    emb = jax.random.normal(jax.random.PRNGKey(1),
                            (batch, t_prompt, lcfg.hidden_size), dtype)
    mask = jnp.ones((batch, t_prompt), bool)

    from walkgpt_tpu.ops.flash_attention import flash_attention

    def flash_fn(q, k, v, key_valid):
        return flash_attention(q, k, v, True, key_valid=key_valid)

    def gen(params, emb, mask, steps):
        r = greedy_generate(params["llm"], lcfg, emb, mask,
                            max_new_tokens=steps, eos_id=-1,
                            flash_fn=flash_fn, kv_quant=cfg.kv_quant_cache or "")
        return r.tokens

    if not skip_parts:
        g1 = jax.jit(lambda p, e, m: gen(p, e, m, 1))
        gn = jax.jit(lambda p, e, m: gen(p, e, m, 1 + n))
        t1 = timeit(g1, params, emb, mask)
        print(f"prefill+1step         {t1*1000:9.1f} ms", flush=True)
        tn = timeit(gn, params, emb, mask)
        print(f"prefill+{1+n}step      {tn*1000:9.1f} ms -> decode "
              f"{(tn-t1)/n*1000:7.2f} ms/step", flush=True)

    # --- 4. the REAL e2e program (generate_and_segment) at two budgets ---
    if os.environ.get("A_E2E", "1") != "0":
        from walkgpt_tpu.data import conversation as conv_lib
        from walkgpt_tpu.data.tokenizer import (ByteTokenizer,
                                                setup_walkgpt_tokens,
                                                tokenizer_image_token)
        tok = ByteTokenizer(model_max_length=4096)
        setup_walkgpt_tokens(tok)
        conv_lib.set_default_conversation("llava_v1")
        conv = conv_lib.conv_templates["llava_v1"].copy()
        conv.messages = []
        conv.append_message(conv.roles[0], "<image>\nDescribe the hazards.")
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt().replace("<image>",
                                           "<im_start><image><im_end>")
        ids = np.array([tokenizer_image_token(prompt, tok)])
        input_ids = jnp.asarray(np.repeat(ids, batch, axis=0))
        attn = jnp.ones(input_ids.shape, bool)
        MAX_SEGS = 16

        def e2e(params, images, input_ids, attn, steps):
            r = walkgpt.generate_and_segment(
                params, cfg, images=images, input_ids=input_ids,
                attention_mask=attn,
                row_image_idx=jnp.arange(batch, dtype=jnp.int32),
                pixel_hw=jnp.broadcast_to(jnp.array([[s - s // 4, s]]),
                                          (batch, 2)),
                max_new_tokens=steps, max_segs=MAX_SEGS * batch, eos_id=-1)
            return r.tokens

        # same compile options as bench.py: the stock TPU remat pass is
        # pathological on these programs (core/xla_opts.py) — with it on,
        # the 1-step e2e program at 7B batch 20 crashes the TPU worker
        from walkgpt_tpu.core.xla_opts import decode_compiler_options
        opts = decode_compiler_options()
        e1 = jax.jit(lambda p, im, ii, a: e2e(p, im, ii, a, 1),
                     compiler_options=opts)
        en = jax.jit(lambda p, im, ii, a: e2e(p, im, ii, a, 1 + n),
                     compiler_options=opts)
        t1e = timeit(e1, params, images, input_ids, attn)
        print(f"e2e 1step             {t1e*1000:9.1f} ms", flush=True)
        tne = timeit(en, params, images, input_ids, attn)
        print(f"e2e {1+n}step          {tne*1000:9.1f} ms -> decode "
              f"{(tne-t1e)/n*1000:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
