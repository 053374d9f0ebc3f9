"""Time the generate_and_segment TAIL in isolation (real TPU).

The tail = everything after the decode loop: [SEG] gather over generated
tokens, CTP projection, per-seg SAM mask decode (TwoWayTransformer), 1024^2
canvas bilinear upsample, mask score. Synthetic inputs at bench shapes, so
no SAM encode / prefill / decode is run.

Run: python benchmarks/profile_tail.py [model] [batch] [max_new]
Env: T_CHUNK overrides cfg.mask_decode_chunk.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_SEGS = 16


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
    from walkgpt_tpu.models.walkgpt import sam_config, ctp_apply
    from walkgpt_tpu.ops.resize import bilinear_resize

    model = sys.argv[1] if len(sys.argv) > 1 else "7b"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    max_new = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    cfg_fn = {"7b": walkgpt_7b_config, "13b": walkgpt_13b_config,
              "1b": flagship_1b_config}[model]
    cfg = cfg_fn(seg_token_id=32000)
    cfg = dataclasses.replace(cfg, clip=None)
    if os.environ.get("T_CHUNK"):
        cfg = dataclasses.replace(cfg,
                                  mask_decode_chunk=int(os.environ["T_CHUNK"]))
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    # only the params the tail touches: sam decoder/prompt + ctp
    full = walkgpt.init(key, dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, num_layers=1)), dtype=dtype)
    params = {"sam": full["sam"], "ctp": full["ctp"]}

    max_segs = MAX_SEGS * batch
    H = cfg.llm.hidden_size
    img_size = cfg.sam.img_size
    feats = jax.random.normal(key, (batch, 64, 64, 256), dtype)
    tokens = np.zeros((batch, max_new), np.int32)
    tokens[:, 5:5 + MAX_SEGS] = 32000          # MAX_SEGS [SEG]s per row
    tokens = jnp.asarray(tokens)
    pred_hidden = jax.random.normal(key, (batch, max_new, H), dtype)
    row_image_idx = jnp.arange(batch, dtype=jnp.int32)
    s = img_size
    pixel_hw = jnp.broadcast_to(jnp.array([[s - s // 4, s]]), (batch, 2))

    def tail(params, feats, tokens, pred_hidden):
        seg_mask = tokens == cfg.seg_token_id
        flat = seg_mask.reshape(-1)
        (seg_idx,) = jnp.nonzero(flat, size=max_segs, fill_value=0)
        seg_valid = jnp.arange(max_segs) < flat.sum()
        seg_rows = seg_idx // tokens.shape[1]
        hid = pred_hidden.reshape(-1, H)[seg_idx]
        pred_embeddings = ctp_apply(params["ctp"][0], hid)
        img_of_seg = row_image_idx[seg_rows]

        def seg_chunk(emb, img_idx):
            low_res, _ = sam.decode_masks(params["sam"], sam_config(cfg),
                                          feats[img_idx],
                                          text_embeds=emb[:, None],
                                          multimask_output=False)
            canvas = bilinear_resize(low_res[:, 0][..., None],
                                     (img_size, img_size))[..., 0]
            hw = pixel_hw[img_idx]
            yy = jnp.arange(img_size)[None, :, None]
            xx = jnp.arange(img_size)[None, None, :]
            pv = (yy < hw[:, 0, None, None]) & (xx < hw[:, 1, None, None])
            return canvas, walkgpt._mask_score(canvas, pv)

        chunk = cfg.mask_decode_chunk
        if chunk and max_segs > chunk and max_segs % chunk == 0:
            n = max_segs // chunk
            canvas, score = jax.lax.map(
                lambda a: seg_chunk(*a),
                (pred_embeddings.reshape(n, chunk, -1),
                 img_of_seg.reshape(n, chunk)))
            canvas = canvas.reshape(max_segs, img_size, img_size)
            score = score.reshape(max_segs)
        else:
            canvas, score = seg_chunk(pred_embeddings, img_of_seg)
        return score, seg_valid, canvas.sum()

    fn = jax.jit(tail)
    out = fn(params, feats, tokens, pred_hidden)
    float(out[0].sum())
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(params, feats, tokens, pred_hidden)
        float(out[0].sum() + out[2])
        best = min(best, time.perf_counter() - t0)
    print(f"tail ({max_segs} segs, chunk={cfg.mask_decode_chunk}): "
          f"{best*1000:.1f} ms/batch{batch}  "
          f"({best/batch*1000:.1f} ms/img)")


if __name__ == "__main__":
    main()
