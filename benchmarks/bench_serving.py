"""Wave decode vs ContinuousBatcher — the decode-engine duality bench
(round-4 VERDICT next #4: BASELINE config 3's "continuous image batching",
measured, not asserted).

At matched (model, batch, prompt, budget):
  * wave: one fused greedy_generate program; EVERY row pays the max budget
    even after its answer is finished (the whole-batch schedule the e2e
    bench uses) — this is also the honest comparator for the reference's
    as-written UNBATCHED loop (evaluation_walkgpt.py:569);
  * batcher: runtime/serving.ContinuousBatcher — jitted K-step decode
    segments with a host readback + slot refill between segments, over a
    request stream whose answer lengths follow a PAVE-LIKE distribution:
    ~60 template tokens + ~24 per detected object, objects uniform 1..8
    (the [p] name [/p][SEG] + [distance] grammar), i.e. budgets in
    [84, 252] around mean ~168.

On the tunneled axon TPU the host-in-the-loop engine pays ~0.5-1.5 s per
dispatch; this bench quantifies exactly that trade so the engine choice is
data, not vibes.

Run: python benchmarks/bench_serving.py [1b|7b|demo] [kv ...]
  kv: none int8_flat int4_flat ... (default: none + int8_flat + int4_flat
  for 7b, none for the others)
Env: BENCH_BATCH (16), BENCH_PROMPT (384), BENCH_NEW_TOKENS (256),
BENCH_REQS (batch*4), BENCH_QUANT (int4x for 7b, none otherwise),
BENCH_SEGMENT (32), BENCH_ROUND (05).
Writes BENCH_serving_{model}_r{round}.json at the repo root.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pave_like_budgets(rng, n, cap):
    """~60 template tokens + 24/object, 1..8 objects (PAVE answer grammar)."""
    return [int(min(60 + 24 * rng.randint(1, 9), cap)) for _ in range(n)]


def main():
    """Orchestrator: one SUBPROCESS per (engine, kv-format) measurement —
    at 7B the wave's executables + the batcher's persistent slot pool
    cannot share one 16 GB HBM arena (measured RESOURCE_EXHAUSTED even on
    int8_flat); a fresh process per point sidesteps arena fragmentation
    entirely, like benchmarks/bench_scales.py does per scale."""
    import subprocess
    kind = (sys.argv[1] if len(sys.argv) > 1
            else os.environ.get("BENCH_MODEL", "1b"))
    kv_list = sys.argv[2:] or (["int8_flat", "int4_flat"]
                               if kind == "7b" else ["none"])
    rnd = os.environ.get("BENCH_ROUND", "05")
    results = []
    meta = {}
    for kv in kv_list:
        for engine in ("wave", "batcher"):
            env = dict(os.environ, BENCH_ENGINE=engine, BENCH_KVFMT=kv)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single",
                 kind], env=env, capture_output=True, text=True,
                timeout=3600)
            line = ""
            for ln in proc.stdout.splitlines():
                print(ln, flush=True)
                if ln.strip().startswith("{"):
                    line = ln.strip()
            if not line:
                print(proc.stderr[-1500:], flush=True)
                results.append({"kv_cache": kv, "engine": engine,
                                "error": "no result (see log)"})
                continue
            rec = json.loads(line)
            meta = rec.get("meta", meta)
            rec.pop("meta", None)
            results.append(rec)
    out = {"metric": (f"continuous batcher vs wave decode ({kind}, "
                      f"{meta.get('quant')} weights, batch "
                      f"{meta.get('batch')}, prompt {meta.get('prompt')}, "
                      f"PAVE-like budgets mean {meta.get('mean_budget')} "
                      f"(cap {meta.get('max_new')}), {meta.get('n_req')} "
                      f"requests, segment {meta.get('segment')}; wave = "
                      f"whole-batch schedule paying max budget; one fresh "
                      f"process per measurement)"),
           "points": results}
    print(json.dumps(out))
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"BENCH_serving_{kind}_r{rnd}.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {out_path}", flush=True)


def single():
    import dataclasses

    import jax
    import jax.numpy as jnp
    from walkgpt_tpu.core.config import LLAMA_1B, LLAMA_7B, LLAMA_TINY
    from walkgpt_tpu.models import llm
    from walkgpt_tpu.ops import quant as quant_lib
    from walkgpt_tpu.runtime.generate import greedy_generate
    from walkgpt_tpu.runtime.serving import ContinuousBatcher

    kind = sys.argv[2]
    engine = os.environ["BENCH_ENGINE"]
    kv_list = [os.environ["BENCH_KVFMT"]]
    base = {"1b": LLAMA_1B, "7b": LLAMA_7B, "demo": LLAMA_TINY}[kind]
    cfg = dataclasses.replace(base, vocab_size=32016)
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    prompt_len = int(os.environ.get("BENCH_PROMPT", "384"))
    max_new = int(os.environ.get("BENCH_NEW_TOKENS", "256"))
    n_req = int(os.environ.get("BENCH_REQS", str(batch * 4)))
    segment = int(os.environ.get("BENCH_SEGMENT", "32"))
    quant = os.environ.get("BENCH_QUANT", "int4x" if kind == "7b" else "none")
    rnd = os.environ.get("BENCH_ROUND", "05")
    dtype = jnp.float32 if kind == "demo" else jnp.bfloat16
    t00 = time.time()

    def phase(msg):
        print(f"# [{time.time() - t00:7.1f}s] {msg}", flush=True)

    phase(f"init {kind} weights (quant={quant})")
    if quant == "none":
        params = llm.init(jax.random.PRNGKey(0), cfg, dtype=dtype)
    else:
        params = quant_lib.quantized_llm_init(
            jax.random.PRNGKey(0), cfg, dtype,
            act_quant=quant in ("w8a8", "int4", "int4x"),
            mlp_int4=quant in ("int4", "int4x"),
            attn_int4=quant == "int4x", head_int4=quant == "int4x")

    rng = np.random.RandomState(0)
    ids = rng.randint(3, cfg.vocab_size - 16, (batch, prompt_len))
    mask = jnp.ones((batch, prompt_len), bool)
    embeds = llm.embed(params, jnp.asarray(ids)).astype(dtype)
    budgets = pave_like_budgets(np.random.RandomState(1), n_req, max_new)
    mean_budget = float(np.mean(budgets))
    prompts = [list(map(int, np.random.RandomState(100 + i).randint(
        3, cfg.vocab_size - 16, prompt_len))) for i in range(n_req)]

    kv = kv_list[0]
    kvq = "" if kv == "none" else kv
    meta = {"quant": quant, "batch": batch, "prompt": prompt_len,
            "max_new": max_new, "n_req": n_req, "segment": segment,
            "mean_budget": round(mean_budget)}
    if engine == "wave":
        # ---- wave: n_req/batch waves, every row pays max_new steps ----
        phase(f"[{kv}] wave compile")
        wave = jax.jit(lambda p, e, m: greedy_generate(
            p, cfg, e, m, max_new_tokens=max_new, eos_id=-1, kv_quant=kvq))
        float(wave(params, embeds, mask).tokens.sum())
        n_waves = -(-n_req // batch)
        t0 = time.perf_counter()
        acc = []
        for _ in range(n_waves):
            acc.append(wave(params, embeds, mask).tokens.sum())
        float(sum(acc))
        wave_dt = time.perf_counter() - t0
        wave_req_s = n_req / wave_dt
        phase(f"[{kv}] wave: {wave_dt:.2f}s for {n_waves} waves "
              f"({wave_req_s:.3f} req/s)")
        print(json.dumps({
            "kv_cache": kv, "engine": "wave", "meta": meta,
            "seconds": round(wave_dt, 2),
            "requests_per_sec": round(wave_req_s, 3),
            "tokens_per_sec": round(n_waves * batch * max_new / wave_dt, 1),
        }))
        return
    # ---- continuous batcher over the variable-length stream ----
    phase(f"[{kv}] batcher compile + run ({n_req} reqs)")
    batcher = ContinuousBatcher(params, cfg, batch_size=batch,
                                prompt_len=prompt_len,
                                max_new_tokens=max_new,
                                segment=segment, eos_id=-1,
                                kv_quant=kvq)
    # warmup: compile admit/segment programs on a small stream
    batcher.run(iter(prompts[:batch]), budgets=budgets[:batch])
    t0 = time.perf_counter()
    finished = batcher.run(iter(prompts), budgets=budgets)
    cb_dt = time.perf_counter() - t0
    n_tok = sum(len(f.tokens) for f in finished)
    cb_req_s = len(finished) / cb_dt
    phase(f"[{kv}] batcher: {cb_dt:.2f}s, {n_tok} tokens "
          f"({cb_req_s:.3f} req/s)")
    print(json.dumps({
        "kv_cache": kv, "engine": "batcher", "meta": meta,
        "seconds": round(cb_dt, 2),
        "requests_per_sec": round(cb_req_s, 3),
        "useful_tokens_per_sec": round(n_tok / cb_dt, 1),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        single()
    else:
        main()
