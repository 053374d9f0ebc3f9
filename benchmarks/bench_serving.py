"""Wave decode vs ContinuousBatcher — the decode-engine duality bench
(VERDICT r1 Weak #8 follow-up).

Measures, at matched batch size and budget:
  * wave: one fused greedy_generate program (prefill + scan of decode steps);
  * batcher: steady-state segment throughput (jitted K-step segments with a
    host readback + slot refill between segments), reported as tokens/sec and
    as effective img/s for a stream whose answer lengths VARY uniformly in
    [N/4, N] — the regime where slot refill wins on attached hardware.

On the tunneled axon TPU the host-in-the-loop engine pays ~0.5-1.5 s per
dispatch; this bench quantifies exactly that trade so the engine choice is
data, not vibes. Run: python benchmarks/bench_serving.py [1b|demo]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from walkgpt_tpu.core.config import LLAMA_1B, LLAMA_TINY
    from walkgpt_tpu.models import llm
    from walkgpt_tpu.runtime.generate import greedy_generate
    from walkgpt_tpu.runtime.serving import ContinuousBatcher

    kind = (sys.argv[1] if len(sys.argv) > 1
            else os.environ.get("BENCH_MODEL", "1b"))
    import dataclasses
    cfg = dataclasses.replace(LLAMA_1B if kind == "1b" else LLAMA_TINY,
                              vocab_size=32016)
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    prompt_len = int(os.environ.get("BENCH_PROMPT", "384"))
    max_new = int(os.environ.get("BENCH_NEW_TOKENS", "128"))
    n_req = batch * 2
    dtype = jnp.bfloat16 if kind == "1b" else jnp.float32

    params = llm.init(jax.random.PRNGKey(0), cfg, dtype=dtype)
    rng = np.random.RandomState(0)
    ids = rng.randint(3, cfg.vocab_size - 16, (batch, prompt_len))
    mask = jnp.ones((batch, prompt_len), bool)
    embeds = llm.embed(params, jnp.asarray(ids)).astype(dtype)

    # ---- wave ----
    wave = jax.jit(lambda e, m: greedy_generate(
        params, cfg, e, m, max_new_tokens=max_new, eos_id=2))
    out = wave(embeds, mask)
    float(out.tokens.sum())
    t0 = time.perf_counter()
    iters = 2
    acc = []
    for _ in range(iters):
        acc.append(wave(embeds, mask).tokens.sum())
    float(sum(acc))
    wave_dt = (time.perf_counter() - t0) / iters
    wave_tok_s = batch * max_new / wave_dt

    # ---- continuous batcher ----
    # variable answer lengths via per-request budgets (uniform N/4..N): the
    # wave would pay max_new steps for every row; the batcher refills.
    batcher = ContinuousBatcher(params, cfg, batch_size=batch,
                                prompt_len=prompt_len, max_new_tokens=max_new,
                                segment=32, eos_id=2)
    prompts = [list(map(int, rng.randint(3, cfg.vocab_size - 16,
                                         prompt_len)))
               for _ in range(n_req)]
    budgets = [int(b) for b in rng.randint(max_new // 4, max_new + 1, n_req)]
    t0 = time.perf_counter()
    finished = batcher.run(iter(prompts), budgets=budgets)
    cb_dt = time.perf_counter() - t0
    n_tok = sum(len(f.tokens) for f in finished)
    cb_tok_s = n_tok / cb_dt

    print(json.dumps({
        "metric": f"decode engines tokens/sec ({kind}, batch {batch}, "
                  f"prompt {prompt_len}, budget {max_new})",
        "wave_tokens_per_sec": round(wave_tok_s, 1),
        "batcher_tokens_per_sec": round(cb_tok_s, 1),
        "wave_ms_per_wave": round(wave_dt * 1000, 1),
        "batcher_sec_total": round(cb_dt, 2),
        "batcher_requests": len(finished),
    }))


if __name__ == "__main__":
    main()
