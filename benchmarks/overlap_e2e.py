"""A/B: fused one-program pipeline vs split encode / decode programs with
double-buffered dispatch (round-3 VERDICT weak #4's hypothesis: overlap
batch k+1's SAM encode with batch k's decode for a ~1.2-1.4x e2e win).

Architectural caveat being tested: a TPU core executes ONE program at a
time — two dispatched programs serialize on the device, so the only real
overlap channels for a split pipeline are host-side (dispatch gaps,
transfers via the DMA engines) plus whatever fusion the mega-program loses
at the boundary. This script measures both schedules at the bench.py 1B
configuration and prints the honest delta.

Modes:
  fused — bench.py's one-graph generate_and_segment per batch, K batches
          dispatched back-to-back (readback only at the end) = the current
          bench schedule.
  split — program A: SAM encode + MSQP (+ feats); program B: splice +
          prefill + decode + SEG extract + mask decode. Dispatch order:
          A_0, A_1, B_0, A_2, B_1, ... (A_{k+1} queued before B_k) so IF
          the runtime could overlap, encode k+1 would hide behind decode k.

Run: python benchmarks/overlap_e2e.py [batch] [new_tokens] [n_batches]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    max_new = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    os.environ.setdefault("BENCH_MODEL", "1b")

    import jax
    import jax.numpy as jnp
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache_dir = os.path.join(repo, ".cache", "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, repo)

    from walkgpt_tpu.core.config import flagship_1b_config
    from walkgpt_tpu.core.xla_opts import decode_compiler_options
    from walkgpt_tpu.data.tokenizer import ByteTokenizer, setup_walkgpt_tokens
    from walkgpt_tpu.models import walkgpt
    from walkgpt_tpu.ops.quant import quantize_sam_encoder
    from walkgpt_tpu.runtime.generate import greedy_generate

    tok = ByteTokenizer(model_max_length=4096)
    st = setup_walkgpt_tokens(tok)
    cfg = flagship_1b_config(seg_token_id=st.seg_token_idx).replace(
        clip=None, fast_windowed_attention=True, fast_gelu=True,
        kv_quant_cache="int8_flat")
    dtype = jnp.bfloat16
    params = walkgpt.init_quantized(jax.random.PRNGKey(0), cfg, dtype,
                                    act_quant=True, sam_int8=True)
    s = cfg.sam.img_size
    rng = np.random.RandomState(0)
    ids = np.full((batch, 192), 65, np.int64)
    ids[:, 5] = -200
    max_segs = 16 * batch
    images = [jnp.asarray(rng.randn(batch, s, s, 3), dtype)
              for _ in range(2)]          # alternate two uploads
    input_ids = jnp.asarray(ids)
    attn = jnp.ones(ids.shape, bool)
    row_idx = jnp.arange(batch, dtype=jnp.int32)
    hw = jnp.broadcast_to(jnp.array([[s - s // 4, s]]), (batch, 2))

    opts = decode_compiler_options()

    fused = jax.jit(lambda p, im: walkgpt.generate_and_segment(
        p, cfg, images=im, input_ids=input_ids, attention_mask=attn,
        row_image_idx=row_idx, pixel_hw=hw, max_new_tokens=max_new,
        max_segs=max_segs, eos_id=tok.eos_token_id), compiler_options=opts)

    enc = jax.jit(lambda p, im: walkgpt.encode_sam(p, cfg, im),
                  compiler_options=opts)

    def decode_part(p, feats, sam_tokens):
        out = walkgpt.generate_and_segment(
            p, cfg, images=None, input_ids=input_ids,
            attention_mask=attn, row_image_idx=row_idx, pixel_hw=hw,
            max_new_tokens=max_new, max_segs=max_segs,
            eos_id=tok.eos_token_id, precomputed_sam=(feats, sam_tokens))
        return out.tokens + 0 * out.mask_scores.sum().astype(out.tokens.dtype)

    dec = jax.jit(decode_part, compiler_options=opts)

    # --- compile + warm ---
    t0 = time.perf_counter()
    out = fused(params, images[0])
    float(out.tokens.sum())
    f, st_ = enc(params, images[0])
    toks = dec(params, f, st_)
    float(toks.sum())
    print(f"# compile+warm {time.perf_counter() - t0:.1f}s", flush=True)

    def run_fused():
        t0 = time.perf_counter()
        accs = []
        for k in range(n_batches):
            accs.append(fused(params, images[k % 2]).tokens.sum())
        float(sum(accs))
        return (time.perf_counter() - t0) / n_batches

    def run_split():
        t0 = time.perf_counter()
        accs = []
        f, st_ = enc(params, images[0])
        for k in range(n_batches):
            if k + 1 < n_batches:
                f_next = enc(params, images[(k + 1) % 2])
            accs.append(dec(params, f, st_).sum())
            if k + 1 < n_batches:
                f, st_ = f_next
        float(sum(accs))
        return (time.perf_counter() - t0) / n_batches

    results = {}
    for name, fn in (("fused", run_fused), ("split", run_split),
                     ("fused2", run_fused), ("split2", run_split)):
        dt = fn()
        results[name] = dt
        print(f"{name}: {dt * 1000:.1f} ms/batch = {batch / dt:.3f} img/s",
              flush=True)
    best_f = min(results["fused"], results["fused2"])
    best_s = min(results["split"], results["split2"])
    print(f"SPLIT/FUSED speedup: {best_f / best_s:.3f}x "
          f"({'split wins' if best_s < best_f else 'fused wins'})")


if __name__ == "__main__":
    main()
