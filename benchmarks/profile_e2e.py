"""Trace ONE execution of the full bench pipeline with jax.profiler and
print the top device ops by total self time (parses the perfetto
trace.json.gz the profiler writes — no tensorboard needed)."""
from __future__ import annotations
import dataclasses, glob, gzip, json, os, sys
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from walkgpt_tpu.core.config import walkgpt_7b_config, flagship_1b_config
    from walkgpt_tpu.models import walkgpt
    from walkgpt_tpu.data import conversation as conv_lib
    from walkgpt_tpu.data.tokenizer import (ByteTokenizer, setup_walkgpt_tokens,
                                            tokenizer_image_token)
    model = sys.argv[1] if len(sys.argv) > 1 else "7b"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    quant = os.environ.get("P_QUANT", "int4")
    cfg_fn = {"7b": walkgpt_7b_config, "1b": flagship_1b_config}[model]
    cfg = cfg_fn(seg_token_id=32000)
    cfg = dataclasses.replace(cfg, clip=None, fast_windowed_attention=True,
                              fast_gelu=True,
                              kv_quant_cache=os.environ.get("P_KV", "int8"),
                              decode_scan_segment=int(
                                  os.environ.get("P_SCANSEG", "256")))
    if quant:
        params = walkgpt.init_quantized(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16,
            act_quant=quant in ("w8a8", "int4", "int4x"),
            mlp_int4=quant in ("int4", "int4x"),
            attn_int4=quant == "int4x", head_int4=quant == "int4x",
            sam_int8=True)
    else:
        params = walkgpt.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    print("# init done", flush=True)
    tok = ByteTokenizer(model_max_length=4096)
    setup_walkgpt_tokens(tok)
    # minimal prompt: byte tokenizer makes the llava template ~760 ids; use
    # a short raw prompt so t+255 matches the bench's BPE footprint (~400)
    raw = "USER: <im_start><image><im_end>\nWhich hazards do you see? " \
          "List the accessible and non-accessible objects. ASSISTANT:"
    ids = np.array([tokenizer_image_token(raw, tok)])
    s = cfg.sam.img_size
    input_ids = jnp.asarray(np.repeat(ids, batch, axis=0))
    attn = jnp.ones(input_ids.shape, bool)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, s, s, 3), jnp.bfloat16)
    def pipeline(params, images, input_ids, attention_mask):
        return walkgpt.generate_and_segment(
            params, cfg, images=images, input_ids=input_ids,
            attention_mask=attention_mask,
            row_image_idx=jnp.arange(batch, dtype=jnp.int32),
            pixel_hw=jnp.broadcast_to(jnp.array([[s - s // 4, s]]), (batch, 2)),
            max_new_tokens=steps, max_segs=16 * batch, eos_id=2)
    from walkgpt_tpu.core.xla_opts import decode_compiler_options
    fn = jax.jit(pipeline, compiler_options=decode_compiler_options())
    out = fn(params, images, input_ids, attn)
    print("# warm:", float(out.tokens.sum()), flush=True)
    import time
    tdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    out = fn(params, images, input_ids, attn)
    v = float(out.tokens.sum())
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"# traced run: {dt*1000:.1f} ms", flush=True)
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    print("# trace files:", paths, flush=True)
    if not paths:
        return
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # aggregate complete events by name on device tracks
    agg = {}
    cnt = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0)
        cnt[name] = cnt.get(name, 0) + 1
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    for name, dur in top:
        print(f"{dur/1e6:9.3f} s  x{cnt[name]:6d}  {name[:120]}")

if __name__ == "__main__":
    main()
