"""Training-step throughput on the real TPU (WalkGPT-1B, bf16, ).

Runs the full teacher-forced training forward+backward (SAM encode with the
packed windowed-attention kernel's Pallas backward, MSQP, splice, LLM with
causal-flash backward, CTP, mask decode, all losses) + AdamW update, and
reports examples/sec. This also serves as the hardware smoke for every
Pallas backward kernel — they are otherwise only exercised in interpreter
mode by the CPU test suite.

Run: python benchmarks/bench_train.py [batch] [accum]
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
    from walkgpt_tpu.core.config import flagship_1b_config
    from walkgpt_tpu.data.tokenizer import ByteTokenizer, setup_walkgpt_tokens
    from walkgpt_tpu.runtime import train as tr
    import __graft_entry__ as ge

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    tok = ByteTokenizer(model_max_length=2048)
    st = setup_walkgpt_tokens(tok)
    import dataclasses
    cfg = flagship_1b_config(seg_token_id=st.seg_token_idx)
    cfg = dataclasses.replace(cfg, clip=None)
    from walkgpt_tpu.models import walkgpt
    params = walkgpt.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    arrays, max_segs = ge._make_inputs(cfg, tok, st, n_images=batch)
    arrays = {k: (v.astype(jnp.bfloat16)
                  if v.dtype == jnp.float32 else v) for k, v in arrays.items()}

    import functools
    tcfg = tr.TrainConfig(warmup_steps=2, total_steps=100, lr=2e-4)
    state, opt = tr.init_state(params, tcfg)
    step = jax.jit(functools.partial(tr.train_step, opt=opt, model_cfg=cfg,
                                     max_segs=max_segs))

    state, metrics = step(state, arrays)          # compile
    print(f"# compile ok, loss={float(metrics['loss']):.4f}", flush=True)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        state, metrics = step(state, arrays)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"train step (1B, batch {batch}): {dt*1e3:.1f} ms "
          f"-> {batch/dt:.2f} examples/sec  loss={float(metrics['loss']):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
