"""AOT memory analysis of the bench pipeline — no execution, compile only.

Prints XLA's static memory breakdown (args/output/temp/peak) for the exact
program bench.py runs, so cache-layout / batch choices can be sized against
the 16 GB v5e HBM without burning a 20-minute OOM run.

Usage: BENCH_MODEL=7b BENCH_KV=int8_flat BENCH_BATCH=20 python benchmarks/mem_analysis.py
"""
from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from walkgpt_tpu.core.config import flagship_1b_config
    from walkgpt_tpu.data.tokenizer import (ByteTokenizer, setup_walkgpt_tokens,
                                            tokenizer_image_token)
    from walkgpt_tpu.data import conversation as conv_lib
    from walkgpt_tpu.models import walkgpt
    from walkgpt_tpu.core.xla_opts import decode_compiler_options

    model_kind = os.environ.get("BENCH_MODEL", "7b")
    max_new = int(os.environ.get(
        "BENCH_NEW_TOKENS", "512" if model_kind in ("7b", "13b") else "128"))
    batch = int(os.environ.get(
        "BENCH_BATCH", {"7b": "20", "13b": "4"}.get(model_kind, "16")))
    tok = ByteTokenizer(model_max_length=4096)
    st = setup_walkgpt_tokens(tok)
    if model_kind == "7b":
        from walkgpt_tpu.core.config import walkgpt_7b_config
        cfg = walkgpt_7b_config(seg_token_id=st.seg_token_idx)
    elif model_kind == "13b":
        from walkgpt_tpu.core.config import walkgpt_13b_config
        cfg = walkgpt_13b_config(seg_token_id=st.seg_token_idx)
    else:
        cfg = flagship_1b_config(seg_token_id=st.seg_token_idx)
    kv = os.environ.get("BENCH_KV", "int8")
    cfg = dataclasses.replace(
        cfg, clip=None, fast_windowed_attention=True, fast_gelu=True,
        kv_quant_cache=kv if kv in ("int8", "int4", "int8_flat") else False,
        sam_encode_chunk=int(os.environ.get("BENCH_SAM_CHUNK", "0")),
        prefill_chunk=int(os.environ.get("BENCH_PREFILL_CHUNK", "0")),
        decode_cache_grow=int(os.environ.get("BENCH_GROW", "0")),
        decode_scan_segment=int(os.environ.get("BENCH_SCAN_SEG", "256")))

    dtype = jnp.bfloat16
    quant = os.environ.get("BENCH_QUANT", "int4x")
    params = walkgpt.init_quantized(
        jax.random.PRNGKey(0), cfg, dtype,
        act_quant=quant in ("w8a8", "int4", "int4x"),
        mlp_int4=quant in ("int4", "int4x"),
        attn_int4=quant == "int4x", head_int4=quant == "int4x",
        sam_int8=os.environ.get("BENCH_SAM", "int8") == "int8")

    conv_lib.set_default_conversation("llava_v1")
    conv = conv_lib.conv_templates["llava_v1"].copy()
    conv.messages = []
    conv.append_message(conv.roles[0], "<image>\nDescribe accessibility.")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt().replace("<image>", "<im_start><image><im_end>")
    ids = np.array([tokenizer_image_token(prompt, tok)])
    s = cfg.sam.img_size
    MAX_SEGS = 16

    def pipeline(params, images, input_ids, attention_mask):
        return walkgpt.generate_and_segment(
            params, cfg, images=images, input_ids=input_ids,
            attention_mask=attention_mask,
            row_image_idx=jnp.arange(batch, dtype=jnp.int32),
            pixel_hw=jnp.broadcast_to(jnp.array([[s - s // 4, s]]), (batch, 2)),
            max_new_tokens=max_new, max_segs=MAX_SEGS * batch,
            eos_id=tok.eos_token_id)

    fn = jax.jit(pipeline, compiler_options=decode_compiler_options())
    images = jax.ShapeDtypeStruct((batch, s, s, 3), dtype)
    input_ids = jax.ShapeDtypeStruct((batch, ids.shape[1]), jnp.int32)
    attn = jax.ShapeDtypeStruct(input_ids.shape, jnp.bool_)
    lowered = fn.lower(params, images, input_ids, attn)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gib = 1024 ** 3
    print(f"model={model_kind} batch={batch} kv={kv} quant={quant} "
          f"new_tokens={max_new}")
    try:
        print(f"  args   : {ma.argument_size_in_bytes / gib:.3f} GiB")
        print(f"  output : {ma.output_size_in_bytes / gib:.3f} GiB")
        print(f"  temp   : {ma.temp_size_in_bytes / gib:.3f} GiB")
        print(f"  alias  : {ma.alias_size_in_bytes / gib:.3f} GiB")
        tot = (ma.argument_size_in_bytes + ma.output_size_in_bytes
               + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
        print(f"  total  : {tot / gib:.3f} GiB (args+out+temp-alias)")
    except AttributeError:
        print(ma, file=sys.stderr)


if __name__ == "__main__":
    main()
