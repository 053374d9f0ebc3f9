"""Component-wise timing of the PAVE e2e pipeline on the real TPU.

Times SAM encode / MSQP / splice+prefill / decode scan / mask decode as
separately-jitted programs at the bench.py configuration, to target the next
optimization. (Not the driver bench — see bench.py for the one-JSON contract.)

CAVEAT: each separately-jitted stage pays the platform's ~5.7 ms dispatch
overhead, so small stages read high and the sum exceeds the fused e2e time.
Trust relative changes and the large stages; for absolute numbers chain the
op inside one program (see benchmarks/profile_sam.py history in git).

Run: python benchmarks/profile_pipeline.py [batch] [new_tokens]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=3, force=lambda out: None):
    out = fn(*args)
    force(out)   # compile+warmup; axon needs a readback to flush the queue
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    import jax
    import jax.numpy as jnp
    from walkgpt_tpu.core.config import flagship_1b_config
    from walkgpt_tpu.data import conversation as conv_lib
    from walkgpt_tpu.data.tokenizer import ByteTokenizer, setup_walkgpt_tokens, \
        tokenizer_image_token
    from walkgpt_tpu.models import walkgpt, sam
    from walkgpt_tpu.models.walkgpt import sam_config
    from walkgpt_tpu.runtime.generate import greedy_generate

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    max_new = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    max_segs = 16 * batch

    tok = ByteTokenizer(model_max_length=4096)
    st = setup_walkgpt_tokens(tok)
    import dataclasses
    cfg = flagship_1b_config(seg_token_id=st.seg_token_idx)
    cfg = dataclasses.replace(cfg, clip=None, fast_windowed_attention=True)
    dtype = jnp.bfloat16
    params = walkgpt.init(jax.random.PRNGKey(0), cfg, dtype=dtype)

    conv_lib.set_default_conversation("llava_v1")
    conv = conv_lib.conv_templates["llava_v1"].copy()
    conv.messages = []
    conv.append_message(conv.roles[0], "<image>\nWhich nearby features seem "
                        "pedestrian-friendly, and which could make movement unsafe?")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt().replace("<image>", "<im_start><image><im_end>")
    ids = np.repeat(np.array([tokenizer_image_token(prompt, tok)]), batch, axis=0)
    s = cfg.sam.img_size
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, s, s, 3), dtype)
    input_ids = jnp.asarray(ids)
    attn = jnp.ones(ids.shape, bool)
    row_image_idx = jnp.arange(batch, dtype=jnp.int32)

    from walkgpt_tpu.ops.flash_attention import flash_attention
    flash_fn = lambda q, k, v, kv: flash_attention(q, k, v, True, key_valid=kv)

    # --- stage 1: SAM encode
    enc = jax.jit(lambda p, im: walkgpt.encode_sam(p, cfg, im))
    t_enc, (feats, sam_tokens) = timeit(
        enc, params, images, force=lambda o: float(o[0].sum()))
    print(f"SAM encode           {t_enc*1e3:8.1f} ms")

    # --- stage 2: MSQP + splice
    def msqp_splice(p, sam_tokens, input_ids, attn):
        vis = walkgpt.visual_tokens(p, cfg, sam_tokens)[row_image_idx]
        return walkgpt.splice_visual(p, cfg, input_ids, vis, attention_mask=attn)
    f2 = jax.jit(msqp_splice)
    t_msqp, sp = timeit(f2, params, sam_tokens, input_ids, attn,
                        force=lambda o: float(o.embeds.sum()))
    print(f"MSQP + splice        {t_msqp*1e3:8.1f} ms")

    # --- stage 3: full generate (prefill + decode scan)
    gen = jax.jit(lambda p, e, m: greedy_generate(
        p["llm"], cfg.llm, e, m, max_new_tokens=max_new,
        eos_id=tok.eos_token_id, flash_fn=flash_fn))
    t_gen, res = timeit(gen, params, sp.embeds, sp.attention_mask,
                        force=lambda o: float(o.tokens.sum()))
    print(f"generate ({max_new} tok)  {t_gen*1e3:8.1f} ms "
          f"({t_gen/max_new*1e6:.0f} us/tok incl prefill)")

    # prefill alone
    from walkgpt_tpu.models import llm as llm_mod
    pre = jax.jit(lambda p, e, m: llm_mod.forward(
        p["llm"], cfg.llm, e, attention_mask=m, flash_fn=flash_fn)[0])
    t_pre, _ = timeit(pre, params, sp.embeds, sp.attention_mask,
                      force=lambda o: float(o.sum()))
    print(f"prefill alone        {t_pre*1e3:8.1f} ms  "
          f"-> decode {1e3*(t_gen-t_pre):.1f} ms "
          f"({(t_gen-t_pre)/max_new*1e6:.0f} us/step)")

    # --- stage 4: mask decode for max_segs
    hid = jnp.asarray(rng.randn(max_segs, cfg.llm.hidden_size), dtype)
    img_of_seg = jnp.arange(max_segs, dtype=jnp.int32) % batch

    def mask_dec(p, feats, hid):
        emb = walkgpt.ctp_apply(p["ctp"][0], hid)
        low_res, _ = sam.decode_masks(p["sam"], sam_config(cfg),
                                      feats[img_of_seg],
                                      text_embeds=emb[:, None],
                                      multimask_output=False)
        from walkgpt_tpu.ops.resize import bilinear_resize
        return bilinear_resize(low_res[:, 0][..., None], (s, s))[..., 0]
    f4 = jax.jit(mask_dec)
    t_mask, _ = timeit(f4, params, feats, hid, force=lambda o: float(o.sum()))
    print(f"mask decode+upsample {t_mask*1e3:8.1f} ms ({max_segs} segs)")

    total = t_enc + t_msqp + t_gen + t_mask
    print(f"sum of stages        {total*1e3:8.1f} ms -> {batch/total:.2f} img/s "
          f"(e2e bench may differ: fused graph)")


if __name__ == "__main__":
    main()
