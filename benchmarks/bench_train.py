"""Training-step throughput + MFU on the real TPU, all scales
(round-4 VERDICT next #5).

  1b  — FULL training step of the flagship 1B config (bf16 params): SAM
        encode with the packed windowed-attention Pallas backward, MSQP,
        splice, LLM causal-flash backward, CTP, mask decode, all losses,
        AdamW. Also the hardware smoke for every Pallas backward kernel.
  7b/13b — the reference's ACTUAL production workload (QLoRA fine-tune,
        instructions.md:29, train_walkgpt.py:263-305): weight-only
        int8-attention + packed-int4-MLP frozen base (act_quant=False —
        W8A8's round() has zero gradient), dense trainable lm_head/embed,
        fresh r=8 LoRA on q/v, int8 SAM encoder, partitioned
        qlora_train_step with remat (the 16 GB fit lever). 13b uses the
        per-projection int4 attention base (BENCH_TRAIN_ATTN=int4p,
        ops/quant.convert_attn_int4_proj) — with int8 attention the step
        is RESOURCE_EXHAUSTED even at batch 1 (v5e, 2026-08-21).

Measured batch ladder (v5e, 2026-08-21): 7b int8-attn batch 4 = 2.63 ex/s
(MFU 0.58) is the optimum — int4p attn at batch 8 measured 2.42 ex/s
(MFU 0.53): the int4 dual-dot unpack costs more than the extra batch
buys. 13b int4p batch 2 = 1.52 ex/s (MFU 0.61); batch 4 OOMs.

MFU accounting (printed into the artifact):
  * LLM matmul params P_llm from the config (attn 2H(H+kvd) + MLP 3HI per
    layer + lm_head VH); training FLOPs = 6 * P_llm * tokens (2 fwd +
    4 bwd; under QLoRA+remat it is 2 fwd + 2 recompute + 2 dgrad — the
    trainable wgrad is negligible — so the same 6x applies).
  * SAM encoder is FROZEN with no gradient consumer upstream of its input,
    so XLA prunes its backward: 2 * P_sam_blocks * 4096 tokens * B images,
    fwd only.
  * MSQP/CTP/mask-decoder/losses are noise at these scales (<1% FLOPs).
  * peak = 197 TFLOP/s bf16 (v5e); int8 MXU ops would double the
    denominator — reported MFU uses the bf16 peak uniformly, so int8
    phases can exceed their "bf16 MFU" share.

Run: python benchmarks/bench_train.py [model] [batch] [iters]
Writes BENCH_train_{model}_r{BENCH_ROUND or 05}.json at the repo root.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def llm_matmul_params(lcfg) -> int:
    kvd = lcfg.num_kv_heads * lcfg.head_dim
    per_layer = (2 * lcfg.hidden_size * (lcfg.hidden_size + kvd)
                 + 3 * lcfg.hidden_size * lcfg.intermediate_size)
    return (lcfg.num_layers * per_layer
            + lcfg.vocab_size * lcfg.hidden_size)


def sam_block_params(scfg) -> int:
    d = scfg.embed_dim
    return scfg.depth * (4 * d * d + 2 * d * 4 * d)


def main():
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    from walkgpt_tpu.core.config import (flagship_1b_config,
                                         walkgpt_13b_config,
                                         walkgpt_7b_config)
    from walkgpt_tpu.data.tokenizer import ByteTokenizer, setup_walkgpt_tokens
    from walkgpt_tpu.models import walkgpt
    from walkgpt_tpu.runtime import checkpoint as ck
    from walkgpt_tpu.runtime import train as tr
    import __graft_entry__ as ge

    model = sys.argv[1] if len(sys.argv) > 1 else "1b"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else (4 if model == "1b"
                                                       else 2)
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    rnd = os.environ.get("BENCH_ROUND", "05")
    t00 = time.time()

    def phase(msg):
        print(f"# [{time.time() - t00:7.1f}s] {msg}", flush=True)

    tok = ByteTokenizer(model_max_length=2048)
    st = setup_walkgpt_tokens(tok)
    cfg_fn = {"1b": flagship_1b_config, "7b": walkgpt_7b_config,
              "13b": walkgpt_13b_config}[model]
    cfg = dataclasses.replace(cfg_fn(seg_token_id=st.seg_token_idx),
                              clip=None)
    qlora = model in ("7b", "13b")
    remat = qlora
    if qlora:
        # bound SAM/prefill activation transients like the e2e eval configs
        chunk = int(os.environ.get("BENCH_TRAIN_SAM_CHUNK",
                                   str(min(2, batch))))
        cfg = dataclasses.replace(cfg, sam_encode_chunk=chunk)

    phase(f"{model}: init params (qlora={qlora})")
    if qlora:
        # 13B needs the per-projection int4 attention base (LoRA-compatible,
        # ops/quant.convert_attn_int4_proj): the int8 attention base left
        # the step RESOURCE_EXHAUSTED even at batch 1 (2026-08-21)
        attn4 = os.environ.get("BENCH_TRAIN_ATTN",
                               "int4p" if model == "13b" else "int8")
        params = walkgpt.init_quantized(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16, act_quant=False,
            mlp_int4=True, sam_int8=True, quantize_lm_head=False,
            attn_int4_proj=attn4 == "int4p")
        params["llm"] = ck.init_lora(params["llm"], jax.random.PRNGKey(7),
                                     r=8, alpha=16.0)
    else:
        params = walkgpt.init(jax.random.PRNGKey(0), cfg,
                              dtype=jnp.bfloat16)

    arrays, max_segs = ge._make_inputs(cfg, tok, st, n_images=batch)
    arrays = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
              for k, v in arrays.items()}
    t_llm = int(arrays["input_ids"].shape[1]) - 1 + cfg.visual_tokens
    rows = int(arrays["input_ids"].shape[0])

    tcfg = tr.TrainConfig(warmup_steps=2, total_steps=100, lr=2e-4)
    phase("build + compile train step")
    if qlora:
        state, opt, frozen = tr.init_qlora_state(params, tcfg)
        step = jax.jit(functools.partial(
            tr.qlora_train_step, opt=opt, model_cfg=cfg, max_segs=max_segs,
            remat=remat))
        run = lambda s: step(s, frozen, arrays)
    else:
        state, opt = tr.init_state(params, tcfg)
        step = jax.jit(functools.partial(
            tr.train_step, opt=opt, model_cfg=cfg, max_segs=max_segs))
        run = lambda s: step(s, arrays)

    state, metrics = run(state)
    loss0 = float(metrics["loss"])
    phase(f"compile ok, loss={loss0:.4f}; timing {iters} steps")
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = run(state)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    p_llm = llm_matmul_params(cfg.llm)
    p_sam = sam_block_params(cfg.sam)
    sam_tokens = (cfg.sam.img_size // cfg.sam.patch_size) ** 2
    flops = (6.0 * p_llm * rows * t_llm
             + 2.0 * p_sam * sam_tokens * batch)
    peak = 197e12
    mfu = flops / dt / peak
    rec = {
        "metric": (f"train step ({model}{' QLoRA int8/int4 base + remat'
                                        if qlora else ' full bf16'}, "
                   f"batch {batch} images / {rows} rows x {t_llm} spliced "
                   f"tokens, SAM {cfg.sam.img_size}^2; reference recipe "
                   f"bs16 x ga10, instructions.md:29)"),
        "ms_per_step": round(dt * 1000, 1),
        "examples_per_sec": round(batch / dt, 3),
        "loss": round(loss0, 4),
        "mfu_bf16_peak": round(mfu, 4),
        "flops_per_step": flops,
        "flops_note": ("6*P_llm_matmul*tokens (fwd+bwd; QLoRA+remat = "
                       "2 fwd + 2 recompute + 2 dgrad) + 2*P_sam_blocks*"
                       "4096*B fwd-only (frozen encoder backward pruned); "
                       "peak 197e12 bf16"),
    }
    print(json.dumps(rec))
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"BENCH_train_{model}_r{rnd}.json")
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    phase(f"wrote {out_path}")


if __name__ == "__main__":
    main()
