"""Standalone evaluation CLI — the TPU-native counterpart of
/root/reference/evaluation_walkgpt.py (flags :37-122, validate :877-982,
response dump :1019-1032).

Per PAVE val sample:
  1. teacher-forced `model_forward` on the GT conversation produces masks
     scored against the GT planes (the reference's mask-metric path, which
     evaluates masks under teacher forcing — SURVEY §3.2 note);
  2. the generation path (SAM->MSQP tokens, greedy decode) produces the text
     answer recorded as "Question: ... | Answer: ..." in the responses JSON —
     byte-compatible with --save_responses_path artifacts.

Metric accumulation follows evaluation_walkgpt.py:895-981: per-mask binary
{bg, fg} intersection/union histograms (ignore 255), float64 totals, the
union==0 -> giou+=1 rule, reduced across hosts, reported as
"{dataset}, giou: %.4f, ciou: %.4f".

Usage (mirrors the reference CLI surface):
  python -m walkgpt_tpu.runtime.evaluate --val_dataset "PAVE|val" \
      --dataset_dir ./datasets --weight ckpt.../mp_rank_00_model_states.pt \
      --save_responses_path out/responses.json
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from typing import List, Optional

import numpy as np


def parse_args(argv):
    p = argparse.ArgumentParser(description="WalkGPT-TPU evaluation")
    p.add_argument("--version", default="", help="tokenizer/LLM path or name")
    p.add_argument("--tokenizer", default="byte", choices=["byte", "bpe", "hf"],
                   help="byte fallback, self-trained PAVE BPE, or HF files "
                   "via --version")
    p.add_argument("--model_size", default="tiny",
                   choices=["tiny", "demo", "1b", "7b", "13b"])
    p.add_argument("--vision_pretrained", default="", help="SAM .pth path")
    p.add_argument("--weight", default="", help="full model checkpoint "
                   "(mp_rank_00_model_states.pt or orbax dir)")
    p.add_argument("--projector_ckpt", default="", help="out_mm_projector.pt")
    p.add_argument("--val_dataset", default="PAVE|val")
    p.add_argument("--dataset_dir", default="./datasets")
    p.add_argument("--labelmap", default="")
    p.add_argument("--image_size", default=1024, type=int)
    p.add_argument("--model_max_length", default=2048, type=int)
    p.add_argument("--conv_type", default="llava_v1")
    p.add_argument("--use_mm_start_end", action="store_true", default=True)
    p.add_argument("--precision", default="bf16",
                   choices=["fp32", "bf16", "fp16"])
    p.add_argument("--quant", default="none",
                   choices=["none", "int8", "w8a8", "int4", "int4x"],
                   help="quantized LLM (applied after checkpoint load): "
                        "'int8' = weight-only (-23%% decode step at 1B; "
                        "required to fit 7B/13B on one chip), 'w8a8' adds "
                        "dynamic per-token int8 activations (native MXU int8 "
                        "dots), 'int4' = w8a8 attention/head + nibble-packed "
                        "int4 MLPs via the one-launch fused decode kernel "
                        "(ops/int4.py: halves the dominant decode weight "
                        "reads and frees HBM for decode batch), 'int4x' "
                        "additionally packs fused-QKV + lm_head as int4")
    p.add_argument("--kv_cache", default="none",
                   choices=["none", "int8", "int4", "int8_flat", "int4_flat"],
                   help="quantized decode KV cache (per-row scales; the "
                        "scale-folded attention reads it without a "
                        "dequantized copy): int8 halves, int4 quarters the "
                        "per-step cache HBM reads")
    p.add_argument("--sam_quant", default="none", choices=["none", "int8"],
                   help="int8 SAM ViT blocks (~0.6 GB HBM freed at ViT-H)")
    p.add_argument("--sam_chunk", default=0, type=int,
                   help="encode SAM in sub-batches of this size (bounds "
                        "encoder activations at large --val_batch_size)")
    p.add_argument("--sam_scan", action="store_true", default=False,
                   help="stacked-scan SAM encoder layout (stack_for_scan): "
                        "windowed-block runs execute as one compiled "
                        "lax.scan body — measured +3.5%% e2e and half the "
                        "encoder compile time on v5e (bench.py default). "
                        "Single-chip layout: under --mesh the stacked tree "
                        "replicates instead of tp-sharding")
    p.add_argument("--speculative", default=0, type=int,
                   help="prompt-lookup speculative decode with this draft "
                        "length (0 = wave greedy). Token-identical to "
                        "greedy; amortizes weight reads over accepted runs "
                        "of the templated PAVE grammar")
    p.add_argument("--fast", action="store_true", default=False,
                   help="production inference mode: tanh GELU (+ bf16 "
                        "logits on the non-flash einsum path) in the SAM "
                        "encoder — ~15%% faster encode at ~3e-3 bf16 drift. "
                        "The packed windowed-attention kernel runs whenever "
                        "flash attention is on (bit-exact in fp32).")
    p.add_argument("--seg_token_num", default=1, type=int)
    p.add_argument("--image_feature_scale_num", default=1, type=int)
    p.add_argument("--max_new_tokens", default=512, type=int)
    p.add_argument("--val_batch_size", default=1, type=int,
                   help="images per device batch for BOTH the teacher-forced "
                        "and generation passes (the north-star streaming "
                        "throughput path)")
    p.add_argument("--visual_stream", default="sam", choices=["sam", "clip"],
                   help="generation-time visual stream (WART-4): 'sam' = "
                        "SAM-MSQP tokens (evaluation_walkgpt.py:535-577), "
                        "'clip' = CLIP-448 pixels -> mm_projector "
                        "(model/walkgpt.py:629-637 intent)")
    p.add_argument("--max_samples", default=-1, type=int,
                   help="limit evaluated samples (smoke runs)")
    p.add_argument("--mesh", default="",
                   help="sharded inference over a device mesh: 'dp,tp' "
                        "(e.g. '2,4' = 2-way data x 4-way tensor parallel "
                        "over 8 chips). Shards the SAM/LLM towers "
                        "(megatron rules), the batch, and the decode KV "
                        "cache (kv heads over tp, rows over dp) inside ONE "
                        "jitted program — BASELINE config 5's streaming "
                        "sharded eval; token-identical to single-device "
                        "(tests/test_infer_sharded.py). --val_batch_size "
                        "must be a multiple of dp (and of dp*tp under "
                        "shard_map)")
    p.add_argument("--mesh_impl", default="auto",
                   choices=["auto", "gspmd", "shard_map"],
                   help="mesh execution strategy: 'shard_map' = manual "
                        "dp x tp (parallel/tp.py) keeping the production "
                        "Pallas kernels + quantized flat caches under tp>1 "
                        "(SAM visual stream only); 'gspmd' = GSPMD "
                        "programs (any stream; tp>1 downgrades to the XLA "
                        "attention path, parallel/infer.mesh_config); "
                        "'auto' picks shard_map when tp>1 and the stream "
                        "is 'sam'")
    p.add_argument("--log_base_dir", default="./runs")
    p.add_argument("--exp_name", default="walkgpt_eval")
    p.add_argument("--save_responses_path", default="")
    p.add_argument("--no_console_text", action="store_true", default=False)
    p.add_argument("--local_rank", default=0, type=int)
    return p.parse_args(argv)


def build_config(args, seg_token_idx):
    from ..core.config import (demo_config, flagship_1b_config, tiny_config,
                               walkgpt_7b_config, walkgpt_13b_config)
    builders = {"tiny": tiny_config, "demo": demo_config,
                "1b": flagship_1b_config, "7b": walkgpt_7b_config,
                "13b": walkgpt_13b_config}
    cfg = builders[args.model_size](seg_token_id=seg_token_idx)
    if getattr(args, "fast", False):
        cfg = cfg.replace(fast_windowed_attention=True, fast_gelu=True)
    kv = getattr(args, "kv_cache", "none")
    if kv in ("int8", "int4", "int8_flat", "int4_flat"):
        cfg = cfg.replace(kv_quant_cache=kv)
    chunk = int(getattr(args, "sam_chunk", 0) or 0)
    if chunk:
        cfg = cfg.replace(sam_encode_chunk=chunk)
    return cfg


def build_model(args, cfg):
    import jax
    import jax.numpy as jnp
    from ..models import walkgpt
    from . import checkpoint as ck

    dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16,
             "fp16": jnp.float16}[args.precision]
    params = walkgpt.init(jax.random.PRNGKey(0), cfg, dtype=dtype)

    if args.vision_pretrained and os.path.exists(args.vision_pretrained):
        sd = ck.load_torch_state_dict(args.vision_pretrained)
        params = ck.load_into(params, {"sam": ck.convert_sam(
            sd, depth=cfg.sam.depth)})
    if args.projector_ckpt and os.path.exists(args.projector_ckpt):
        if os.path.isdir(args.projector_ckpt):
            # our own stage-1 artifact (train_cli --tune_mm_adapter):
            # {"msqp": ..., "mm_projector": ...} Orbax overlay
            like = {"msqp": params["msqp"]}
            if "mm_projector" in params:
                like["mm_projector"] = params["mm_projector"]
            overlay = ck.load_orbax(args.projector_ckpt, like=like)
            params = ck.load_into(params, overlay)
        else:   # reference out_mm_projector.pt
            sd = ck.load_torch_state_dict(args.projector_ckpt)
            params = ck.load_into(params, {"msqp": ck.convert_msqp(sd)})
    if args.weight and os.path.exists(args.weight):
        if os.path.isdir(args.weight):
            params = ck.load_orbax(args.weight, like=params)
        else:
            sd = ck.load_torch_state_dict(args.weight)
            converted = ck.convert_walkgpt_state(sd, cfg)
            converted["llm"] = ck.merge_lora(converted["llm"])
            params = ck.load_into(params, converted)
    if getattr(args, "quant", "none") in ("int8", "w8a8", "int4", "int4x"):
        # int8 AFTER checkpoint load: halves decode-time weight reads (and
        # makes 7B/13B fit one 16 GB v5e chip); w8a8 also runs dynamic
        # per-token int8 activations on the native int8 MXU path
        from ..ops.quant import quantize_llm
        params = dict(params, llm=quantize_llm(
            params["llm"], act_quant=args.quant in ("w8a8", "int4", "int4x"),
            mlp_int4=args.quant in ("int4", "int4x"),
            attn_int4=args.quant == "int4x",
            head_int4=args.quant == "int4x"))
    if getattr(args, "sam_quant", "none") == "int8":
        from ..ops.quant import quantize_sam_encoder
        params = dict(params, sam=quantize_sam_encoder(
            params["sam"], act_quant=getattr(args, "quant", "") == "w8a8"))
    if getattr(args, "sam_scan", False):
        from ..models import sam_encoder
        params = dict(params, sam=dict(
            params["sam"],
            image_encoder=sam_encoder.stack_for_scan(
                params["sam"]["image_encoder"], cfg.sam)))
    return params


def _question_prompts(batch, conv_type: str, use_mm_start_end: bool):
    """Reference _build_question_prompts (:478-532) behavior."""
    from ..data import conversation as conv_lib
    prompts, questions = [], []
    offset = batch["offset"].tolist()
    for idx in range(len(offset) - 1):
        q_entry = batch["questions_list"][idx]
        if isinstance(q_entry, tuple) and q_entry:
            first = q_entry[0]
            if isinstance(first, (list, tuple)):
                q_entry = first
        if not isinstance(q_entry, (list, tuple)):
            q_entry = [q_entry]
        for j in range(offset[idx + 1] - offset[idx]):
            if j < len(q_entry):
                question = str(q_entry[j])
            else:
                import warnings
                warnings.warn(
                    f"questions payload has {len(q_entry)} entries for "
                    f"{offset[idx + 1] - offset[idx]} conversation rows "
                    f"(image {idx}); generating from an EMPTY prompt for "
                    f"row {j}")
                question = ""
            q_clean = question.replace(conv_lib.DEFAULT_IMAGE_TOKEN, "").strip()
            questions.append(q_clean)
            conv = conv_lib.conv_templates[conv_type].copy()
            conv.messages = []
            conv.append_message(conv.roles[0], question)
            conv.append_message(conv.roles[1], None)
            prompt = conv.get_prompt()
            rep = (conv_lib.DEFAULT_IM_START_TOKEN + conv_lib.DEFAULT_IMAGE_TOKEN
                   + conv_lib.DEFAULT_IM_END_TOKEN if use_mm_start_end
                   else conv_lib.DEFAULT_IMAGE_TOKEN)
            prompts.append(prompt.replace(conv_lib.DEFAULT_IMAGE_TOKEN, rep))
    return prompts, questions


def _pad_prompt_rows(rows, pad_id: int, multiple: int = 64,
                     row_count: int | None = None) -> np.ndarray:
    """Right-pad tokenized prompt rows into one [R, T] matrix with T rounded
    up to `multiple` — x64 length buckets keep the jit cache small.
    row_count (optional) additionally pads the ROW dimension to match the
    teacher-forced batch's bucketed row count (prepare_batch row_multiple);
    pad rows get one live token so attention keeps a valid key, and their
    generations are never consumed (the caller iterates real questions)."""
    t = max(len(r) for r in rows)
    t_pad = ((t + multiple - 1) // multiple) * multiple
    n = max(row_count or len(rows), len(rows))
    ids = np.full((n, t_pad), pad_id, np.int64)
    for j, r in enumerate(rows):
        ids[j, :len(r)] = r
    if n > len(rows):
        ids[len(rows):, 0] = rows[0][0]
    return ids


def decode_answer(tokenizer, token_row: np.ndarray, length: int) -> str:
    ids = [int(t) for t in token_row[:length]]
    while ids and ids[-1] in {tokenizer.eos_token_id, tokenizer.pad_token_id}:
        ids.pop()
    text = tokenizer.decode(ids, skip_special_tokens=False) if ids else ""
    return text.replace("\n", " ").replace("  ", " ").strip()


def _jit_caches(cfg, mesh=None, tp_bundle=None):
    """Shape-bucketed jits for the eval loops: prepare_batch buckets sequence
    lengths (x64) and seg counts (x8), so a handful of XLA programs serve the
    whole dataset instead of eager per-op dispatch.

    mesh: optional jax.sharding.Mesh — both programs then run GSPMD-sharded
    (params under parallel/sharding.param_pspecs, batch axes over 'dp', the
    decode KV cache pinned via cache_constrainer).
    tp_bundle: {"mesh", "specs"} from the shard_map manual-tp setup
    (parallel/tp.repack_params) — both programs then run as shard_map
    manual dp x tp with the REPACKED params, keeping the Pallas kernels
    and quantized flat caches under tp > 1. Takes precedence over mesh."""
    import functools
    import jax
    from ..models import walkgpt

    if tp_bundle is not None:
        from ..parallel import tp as tpmod
        tmesh, tspecs = tp_bundle["mesh"], tp_bundle["specs"]

        @functools.lru_cache(maxsize=16)
        def tp_fwd(max_segs):
            return tpmod.make_tp_forward(tmesh, cfg, tspecs,
                                         max_segs=max_segs)

        @functools.lru_cache(maxsize=16)
        def tp_gen(max_new_tokens, max_segs, eos_id, visual_stream="sam",
                   speculative_k=0):
            assert visual_stream == "sam", \
                "shard_map manual tp serves the SAM stream only"
            return tpmod.make_tp_generate(
                tmesh, cfg, tspecs, max_new_tokens=max_new_tokens,
                max_segs=max_segs, eos_id=eos_id,
                speculative_k=speculative_k)
        return tp_fwd, tp_gen

    mesh_sh = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel import sharding as shd
        mesh_sh = {
            "dp": NamedSharding(mesh, P("dp")),
            "rep": NamedSharding(mesh, P()),
            "pspec_fn": lambda tree: jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s),
                shd.param_pspecs(tree, tp=mesh.shape.get("tp", 1))),
            "cache_constrain": shd.cache_constrainer(mesh),
        }

    @functools.lru_cache(maxsize=16)
    def fwd(max_segs):
        def f(params, images, input_ids, labels, attention_mask,
              row_image_idx, gt_masks, pixel_hw):
            import jax.numpy as jnp
            from ..eval.metrics import device_mask_counts
            # gt arrives uint8 (4x fewer upload bytes than the f32 canvas —
            # values are exact {0, 1, ignore} integers); compute in f32
            gt = gt_masks.astype(jnp.float32)
            out = walkgpt.model_forward(
                params, cfg, images=images, input_ids=input_ids, labels=labels,
                attention_mask=attention_mask, row_image_idx=row_image_idx,
                gt_masks=gt, pixel_hw=pixel_hw, max_segs=max_segs)
            # per-mask IoU histograms reduced ON DEVICE: the host loop reads
            # [M, 3, 2] scalars, not [M, S, S] canvases (the mask readback
            # dominated streaming-eval wall clock on hosted links)
            counts = device_mask_counts(out.pred_masks, gt, out.seg_rows,
                                        row_image_idx, pixel_hw)
            return out, counts
        from ..core.xla_opts import decode_compiler_options
        if mesh is not None:
            jitted = {}

            def wrapper(params, *args):
                if "fn" not in jitted:
                    dp, rep = mesh_sh["dp"], mesh_sh["rep"]
                    in_sh = (mesh_sh["pspec_fn"](params),
                             dp, dp, dp, dp, dp, rep, dp)
                    jitted["fn"] = jax.jit(
                        f, in_shardings=in_sh, out_shardings=rep,
                        compiler_options=decode_compiler_options())
                return jitted["fn"](params, *args)
            return wrapper
        return jax.jit(f, compiler_options=decode_compiler_options())

    @functools.lru_cache(maxsize=16)
    def gen(max_new_tokens, max_segs, eos_id, visual_stream="sam",
            speculative_k=0):
        def g(params, images, input_ids, attention_mask, row_image_idx,
              pixel_hw, images_clip=None, clip_resize_hw=None):
            return walkgpt.generate_and_segment(
                params, cfg, images=images, input_ids=input_ids,
                attention_mask=attention_mask, row_image_idx=row_image_idx,
                pixel_hw=pixel_hw, max_new_tokens=max_new_tokens,
                max_segs=max_segs, eos_id=eos_id,
                images_clip=images_clip, clip_resize_hw=clip_resize_hw,
                visual_stream=visual_stream, speculative_k=speculative_k,
                cache_constrain=mesh_sh.get("cache_constrain"))
        from ..core.xla_opts import decode_compiler_options
        if mesh is not None:
            jitted = {}

            def wrapper(params, *args, **kw):
                if "fn" not in jitted:
                    dp, rep = mesh_sh["dp"], mesh_sh["rep"]
                    in_sh = (mesh_sh["pspec_fn"](params), dp, dp, dp, dp, dp)
                    jitted["fn"] = jax.jit(
                        g, in_shardings=in_sh, out_shardings=rep,
                        compiler_options=decode_compiler_options())
                return jitted["fn"](params, *args, **kw)
            return wrapper
        return jax.jit(g, compiler_options=decode_compiler_options())

    return fwd, gen


def validate(args, cfg, params, tokenizer, dataset, logger=print, mesh=None,
             tp_bundle=None):
    import jax
    import jax.numpy as jnp
    from ..data.collate import collate_batch
    from ..data.tokenizer import tokenizer_image_token
    from ..runtime.batching import prepare_batch
    from ..eval.metrics import (DepthAccuracy, IoUAccumulator,
                                parse_distance_block)

    from ..data.prefetch import prefetch_map, shard_indices

    fwd_cache, gen_cache = _jit_caches(cfg, mesh=mesh, tp_bundle=tp_bundle)

    acc = IoUAccumulator()
    depth = DepthAccuracy()
    text_log: List[dict] = []
    n = len(dataset) if args.max_samples < 0 else min(args.max_samples,
                                                      len(dataset))
    sid = cfg.seg_token_id
    bs = max(1, int(getattr(args, "val_batch_size", 1)))
    stream = getattr(args, "visual_stream", "sam")

    img_dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32

    def load(group):
        samples = [dataset[i] for i in group]
        batch = collate_batch(samples, tokenizer,
                              conv_type=args.conv_type,
                              use_mm_start_end=args.use_mm_start_end)
        # Bucket EVERY data-dependent dimension, not just sequence length:
        # row count (conversation turns per image), seg count, and — for
        # batched runs — a coarse x256 seq bucket. Each distinct shape
        # compiles both eval programs (~200 s at 1B on v5e), so unbucketed
        # batches spend the whole run compiling; bucketed ones converge to
        # a handful of programs and stream.
        db = prepare_batch(batch, img_size=cfg.sam.img_size,
                           seg_token_id=sid, row_multiple=8,
                           seq_multiple=256 if bs > 1 else 64,
                           seg_multiple=16 if bs > 1 else 8)
        # Device transfers happen HERE, in the prefetch thread, so uploads
        # overlap device compute. Images go up ONCE (bf16 on the bf16 path:
        # half the bytes, and the compute dtype anyway) and are shared by
        # the teacher-forced and generation programs; the gt canvas goes up
        # as uint8 (exact {0,1,ignore} values, 4x fewer bytes). Upload
        # volume per 16-image batch drops ~500 MB -> ~115 MB.
        dev = {
            "images": jnp.asarray(db.images, img_dtype),
            "input_ids": jnp.asarray(db.input_ids),
            "labels": jnp.asarray(db.labels),
            "attention_mask": jnp.asarray(db.attention_mask),
            "row_image_idx": jnp.asarray(db.row_image_idx),
            "gt_masks": jnp.asarray(db.gt_masks.astype(np.uint8)),
            "pixel_hw": jnp.asarray(db.pixel_hw),
        }
        return samples, batch, db, dev

    # per-process strided shard (the DistributedSampler equivalent,
    # evaluation_walkgpt.py:393-401) chunked into --val_batch_size groups,
    # with a 2-deep host prefetch overlapping preprocessing and device steps
    shard = shard_indices(n)
    groups = [shard[i:i + bs] for i in range(0, len(shard), bs)]
    import time as _time
    t_wall = _time.perf_counter()
    t_prev = t_wall
    group_secs: List[tuple] = []      # (seconds, images) per device batch
    n_images = 0

    def harvest(samples, batch, db, out, counts, ev, questions):
        """Host-side readback + metric/text accumulation for one batch.
        Runs AFTER the next batch's programs are dispatched (pending queue
        below), so np.asarray readbacks and python bookkeeping overlap the
        device computing batch k+1 instead of serializing with it."""
        seg_valid = np.asarray(out.seg_valid).astype(bool)
        seg_img = np.asarray(db.row_image_idx)[np.asarray(out.seg_rows)]
        counts = np.asarray(counts)                       # [M, 3, 2]
        used = [0] * len(samples)
        for k in range(counts.shape[0]):
            if not seg_valid[k]:
                continue
            img = int(seg_img[k])
            if used[img] >= samples[img].masks.shape[0]:
                continue
            used[img] += 1
            acc.add_counts(counts[k, 0], counts[k, 1], counts[k, 2])

        toks = np.asarray(ev.tokens)
        lens = np.asarray(ev.lengths)
        offset = np.asarray(batch["offset"]).tolist()
        row_img = np.asarray(db.row_image_idx)
        for j, q in enumerate(questions):
            img = int(row_img[j]) if j < len(row_img) else 0
            answer = decode_answer(tokenizer, toks[j], int(lens[j]))
            line = f"Question: {q} | Answer: {answer}"
            image_path = (db.image_paths[img] if img < len(db.image_paths)
                          else "")
            if not args.no_console_text:
                logger(f"[val text] image={image_path}, sample={j} {line}")
            text_log.append({"image_path": image_path, "response": line})
            # depth-text accuracy vs the GT answer's [distance] block
            local_j = j - offset[img]
            convs = samples[img].conversations
            gt_text = convs[local_j] if 0 <= local_j < len(convs) else ""
            gt_depth = parse_distance_block(gt_text)
            if gt_depth:
                depth.update(answer, gt_depth)

    pending = None          # (samples, batch, db, out, counts, ev, questions)
    for samples, batch, db, dev in prefetch_map(load, groups, depth=2):
        n_images += len(samples)
        # 1. teacher-forced mask metrics (jitted per shape bucket; the IoU
        # histograms reduce on device — only [M, 3, 2] counts come back)
        out, counts = fwd_cache(db.max_segs)(
            params, dev["images"], dev["input_ids"], dev["labels"],
            dev["attention_mask"], dev["row_image_idx"], dev["gt_masks"],
            dev["pixel_hw"])

        # 2. generated answers for the response dump (one prompt per
        # conversation row across the whole batch, rows map to images via
        # the same offset structure as the teacher-forced pass)
        prompts, questions = _question_prompts(batch, args.conv_type,
                                               args.use_mm_start_end)
        rows = [tokenizer_image_token(p, tokenizer, return_np=True)
                for p in prompts]
        ids_p = _pad_prompt_rows(rows, tokenizer.pad_token_id,
                                 multiple=128 if bs > 1 else 64,
                                 row_count=int(db.row_image_idx.shape[0]))
        clip_kw = {}
        if stream == "clip":
            clip_kw = dict(
                images_clip=jnp.asarray(batch["images_clip"]),
                clip_resize_hw=jnp.asarray(
                    np.asarray(batch["clip_resize_list"], np.int64)))
        ev = gen_cache(args.max_new_tokens, db.max_segs,
                       tokenizer.eos_token_id, stream,
                       int(getattr(args, "speculative", 0)))(
            params, dev["images"], jnp.asarray(ids_p),
            jnp.asarray(ids_p != tokenizer.pad_token_id),
            dev["row_image_idx"], dev["pixel_hw"],
            **clip_kw)
        # harvest the PREVIOUS batch now that this one is queued on device
        if pending is not None:
            harvest(*pending)
            now = _time.perf_counter()
            group_secs.append((now - t_prev, len(pending[0])))
            t_prev = now
        # keep only the fields harvest() reads: holding the full outputs
        # would pin both batches' [max_segs, S, S] mask canvases on device
        # while the next batch's programs run (~2x the eval-output HBM)
        pending = (samples, batch, db, out._replace(pred_masks=None),
                   counts, ev._replace(pred_masks=None), questions)
    if pending is not None:
        harvest(*pending)
        now = _time.perf_counter()
        group_secs.append((now - t_prev, len(pending[0])))
        t_prev = now

    wall = _time.perf_counter() - t_wall
    steady = 0.0
    if n_images:
        logger(f"[val] {n_images} images in {wall:.1f}s = "
               f"{n_images / wall:.3f} img/s (batch {bs}, stream {stream})")
        if len(group_secs) > 1:
            # the first batches of each (seq, segs) shape bucket carry the
            # XLA compiles; the median per-image group time is the honest
            # streaming rate of the warmed pipeline
            per_img = sorted(t / max(k, 1) for t, k in group_secs)
            steady = 1.0 / per_img[len(per_img) // 2]
            logger(f"[val] steady-state {steady:.3f} img/s "
                   f"(median batch; first batch carries the XLA compiles)")
    acc.all_reduce()
    depth.all_reduce()
    res = acc.results()
    res.update(depth.results())
    res["images_per_sec"] = (n_images / wall) if n_images else 0.0
    res["images_per_sec_steady"] = steady
    logger(format_metric_line(args.val_dataset, res))
    return res, text_log


def format_metric_line(dataset_name: str, res: dict) -> str:
    """The reference's validate log line (train_walkgpt.py:1311-1316) plus the
    depth-text leg."""
    line = (f"{dataset_name}, giou: {res['giou']:.4f}, ciou: {res['ciou']:.4f}, "
            f"mIoU(all): {res['miou_inclusive']:.4f}, "
            f"mIoU(no-bg): {res['miou_exclusive']:.4f}, "
            f"AP50(all): {res['ap50']:.4f}, Recall(all): {res['recall']:.4f}, "
            f"AP50(no-bg): {res['ap50_no_bg']:.4f}, "
            f"Recall(no-bg): {res['recall_no_bg']:.4f}")
    if "depth_acc" in res:
        line += (f", depth-acc: {res['depth_acc']:.4f}, "
                 f"depth-MAE: {res['depth_mae']:.4f}m")
    return line


def ar_validate(args, cfg, params, tokenizer, dataset, logger=print,
                mesh=None, tp_bundle=None):
    """Hungarian-matched multi-mask evaluation for MultiReasonSeg-style data
    (reference ar_validate, train_walkgpt.py:836-1161 / evaluation_walkgpt.py
    :611-874): generate, decode all [SEG] masks, assign predictions to GT by
    point-sampled BCE+dice cost, score matched IoU; per-rank JSON artifacts."""
    import jax.numpy as jnp
    from ..data.collate import collate_batch
    from ..data.tokenizer import tokenizer_image_token
    from ..eval.matcher import match_pred
    from ..eval.metrics import IoUAccumulator, intersection_and_union
    from ..runtime.batching import prepare_batch

    from ..data.prefetch import prefetch_map, shard_indices

    _, gen_cache = _jit_caches(cfg, mesh=mesh, tp_bundle=tp_bundle)
    acc = IoUAccumulator()
    records = []
    acc_list = []                  # per-sample [giou_bg, giou_fg, max_num,
    #                                image_path] (acc_list_{rank}.json,
    #                                train_walkgpt.py:841-842, 1090-1093)
    count_correct = 0              # target-count accuracy: #pred == #gt
    count_total = 0
    n = len(dataset) if args.max_samples < 0 else min(args.max_samples,
                                                      len(dataset))

    def load(i):
        sample = dataset[i]
        batch = collate_batch([sample], tokenizer, conv_type=args.conv_type,
                              use_mm_start_end=args.use_mm_start_end)
        db = prepare_batch(batch, img_size=cfg.sam.img_size,
                           seg_token_id=cfg.seg_token_id)
        return sample, batch, db

    for sample, batch, db in prefetch_map(load, shard_indices(n), depth=2):
        prompts, questions = _question_prompts(batch, args.conv_type,
                                               args.use_mm_start_end)
        rows = [tokenizer_image_token(p, tokenizer, return_np=True)
                for p in prompts]
        ids = _pad_prompt_rows(rows, tokenizer.pad_token_id)
        ev = gen_cache(args.max_new_tokens, db.max_segs,
                       tokenizer.eos_token_id, "sam",
                       int(getattr(args, "speculative", 0)))(
            params, jnp.asarray(db.images), jnp.asarray(ids),
            jnp.asarray(ids != tokenizer.pad_token_id),
            jnp.asarray(db.row_image_idx), jnp.asarray(db.pixel_hw))

        n_pred = int(ev.seg_valid.sum())
        gt = np.asarray(db.gt_masks)
        n_gt = int(sum(m.shape[0] for m in batch["masks_list"]))
        h, w = db.resize_list[0]
        sample_ious = []
        # Hungarian assignment padded to max_num like the reference
        # (train_walkgpt.py:911-965): unmatched GT scores vs an empty
        # prediction, unmatched predictions vs an empty GT
        pairs = []
        if n_pred > 0 and n_gt > 0:
            pred = np.asarray(ev.pred_masks[:n_pred])[:, :h, :w]
            gt_b = gt[:n_gt][:, :h, :w]
            pi, ti = match_pred(pred, gt_b)
            for p_idx, t_idx in zip(pi, ti):
                pairs.append(((pred[p_idx] > 0).astype(np.int64),
                              gt_b[t_idx].astype(np.int64)))
                inter = ((pred[p_idx] > 0) & (gt_b[t_idx] > 0.5)).sum()
                union = ((pred[p_idx] > 0) | (gt_b[t_idx] > 0.5)).sum()
                sample_ious.append(float(inter / (union + 1e-10)))
            matched_p, matched_t = set(int(i) for i in pi), \
                set(int(i) for i in ti)
            empty = np.zeros((h, w), np.int64)
            for t_idx in range(n_gt):
                if t_idx not in matched_t:
                    pairs.append((empty, gt_b[t_idx].astype(np.int64)))
            for p_idx in range(n_pred):
                if p_idx not in matched_p:
                    pairs.append(((pred[p_idx] > 0).astype(np.int64), empty))
        elif n_gt > 0:
            gt_b = gt[:n_gt][:, :h, :w]
            empty = np.zeros((h, w), np.int64)
            pairs = [(empty, gt_b[t].astype(np.int64)) for t in range(n_gt)]
        elif n_pred > 0:
            pred = np.asarray(ev.pred_masks[:n_pred])[:, :h, :w]
            empty = np.zeros((h, w), np.int64)
            pairs = [((pred[p] > 0).astype(np.int64), empty)
                     for p in range(n_pred)]

        sample_acc = np.zeros((2,), np.float64)
        for pb, gb in pairs:
            acc.add_mask(pb, gb)
            inter, union, _tgt = intersection_and_union(pb, gb, 2)
            iou = inter / (union + 1e-5)
            iou[union == 0] += 1.0       # no-object rule (train_walkgpt:1024)
            sample_acc += iou
        max_num = max(n_pred, n_gt, 1)
        acc_list.append([float(sample_acc[0] / max_num),
                         float(sample_acc[1] / max_num), max_num,
                         db.image_paths[0]])
        count_total += 1
        count_correct += int(n_pred == n_gt)
        answer = decode_answer(tokenizer, np.asarray(ev.tokens)[0],
                               int(ev.lengths[0]))
        records.append({"image_path": db.image_paths[0],
                        "pred_count": n_pred, "gt_count": n_gt,
                        "ious": sample_ious, "answer": answer})

    acc.all_reduce()
    res = acc.results()
    counts = _allreduce_counts(np.array([count_correct, count_total],
                                        np.float64))
    res["target_count_acc"] = (counts[0] / counts[1]) if counts[1] else \
        float("nan")
    out_dir = os.path.join(args.log_base_dir, args.exp_name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"out_file_{args.local_rank}.json"),
              "w") as f:
        json.dump(records, f, indent=2)
    with open(os.path.join(out_dir, f"acc_list_{args.local_rank}.json"),
              "w") as f:
        json.dump(acc_list, f)
    logger(format_metric_line(f"{args.val_dataset} [ar]", res)
           + f", target-count-acc: {res['target_count_acc']:.4f}")
    return res, records


def _allreduce_counts(values: np.ndarray) -> np.ndarray:
    from ..eval.metrics import _allreduce_f64
    out = _allreduce_f64(values)
    return out if out is not None else values


def _setup_compile_cache():
    """Persist compiled programs next to the package (same contract as
    bench.py): on the tunneled TPU platform the eval programs cost ~15 min
    of compiles cold, and /tmp does not survive driver rounds."""
    import jax
    try:
        if jax.default_backend() == "cpu":
            # XLA:CPU AOT entries fail their own machine-feature check on
            # reload (prefer-no-scatter pseudo-features), so the cache only
            # costs noise there; the CPU test gate also runs these CLIs.
            return
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".cache",
            "jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:                       # pragma: no cover
        print(f"# compile cache unavailable: {e}", file=sys.stderr)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    _setup_compile_cache()

    from ..data import conversation as conv_lib
    from ..data.pave import PAVEDataset
    from ..data.tokenizer import build_tokenizer, setup_walkgpt_tokens

    conv_lib.set_default_conversation(args.conv_type)
    if args.tokenizer == "bpe":
        from ..data.bpe_tokenizer import build_pave_bpe
        tokenizer = build_pave_bpe(args.dataset_dir,
                                   model_max_length=args.model_max_length)
    else:
        tokenizer = build_tokenizer(args.version or None,
                                    model_max_length=args.model_max_length)
    st = setup_walkgpt_tokens(tokenizer, seg_token_num=args.seg_token_num,
                              image_feature_scale_num=args.image_feature_scale_num,
                              use_mm_start_end=args.use_mm_start_end)

    cfg = build_config(args, st.seg_token_idx)
    mesh = None
    tp_bundle = None
    if getattr(args, "mesh", ""):
        import jax
        from ..parallel import infer, sharding as shd
        dp, tp = (int(x) for x in args.mesh.replace("dp", "").replace(
            "tp", "").split(","))
        assert max(1, args.val_batch_size) % dp == 0, (
            f"--val_batch_size {args.val_batch_size} must be a multiple of "
            f"dp={dp}")
        impl = getattr(args, "mesh_impl", "auto")
        if impl == "auto":
            impl = ("shard_map" if tp > 1
                    and getattr(args, "visual_stream", "sam") == "sam"
                    else "gspmd")
        mesh = shd.make_mesh(dp=dp, tp=tp)
        if impl == "shard_map":
            # manual dp x tp (parallel/tp.py): the production Pallas
            # kernels + quantized flat caches stay under tp>1; weights are
            # REPACKED so even tp slices are valid local packs
            assert getattr(args, "visual_stream", "sam") == "sam", \
                "--mesh_impl shard_map supports the SAM stream only"
            from ..parallel import tp as tpmod
            params = build_model(args, cfg)
            params, specs = tpmod.repack_params(params, cfg, mesh)
            tp_bundle = {"mesh": mesh, "specs": specs}
            print(f"mesh inference (shard_map manual tp): dp={dp} x tp={tp} "
                  f"over {dp * tp} of {len(jax.devices())} devices")
        else:
            cfg = infer.mesh_config(cfg, tp=tp)
            params = build_model(args, cfg)
            params = infer.shard_params(params, mesh)
            print(f"mesh inference (GSPMD): dp={dp} x tp={tp} over "
                  f"{dp * tp} of {len(jax.devices())} devices")
    else:
        params = build_model(args, cfg)

    name = args.val_dataset.split("|")[0]
    split = args.val_dataset.split("|")[1] if "|" in args.val_dataset else "val"
    if name == "MultiReasonSeg":
        from ..data.seg_datasets import MultiReasonSegValDataset
        dataset = MultiReasonSegValDataset(
            args.dataset_dir, json_name=f"muse_{split}.json",
            image_size=min(args.image_size, cfg.sam.img_size),
            pad_size=cfg.sam.img_size)
    else:
        labelmap = args.labelmap or os.path.join(args.dataset_dir,
                                                 "labelmap.json")
        jsonl = os.path.join(args.dataset_dir, f"{split}.jsonl")
        dataset = PAVEDataset(jsonl, labelmap,
                              image_size=min(args.image_size, cfg.sam.img_size),
                              pad_size=cfg.sam.img_size,
                              is_val=True, seg_token_num=args.seg_token_num,
                              clip_image_size=(cfg.clip.image_size
                                               if cfg.clip else 448))

    # parameter/FLOPs banner (evaluation_walkgpt.py:999-1015)
    from ..core import nn
    total = nn.count_params(params)
    print(f"Model parameters: {total:,} (~{total / 1e9:.2f}B)")
    print(f"Estimated compute per batch (FLOPs, seq_len="
          f"{args.model_max_length}): {6 * total * args.model_max_length:,}")

    if name == "MultiReasonSeg":
        res, text_log = ar_validate(args, cfg, params, tokenizer,
                                    dataset, mesh=mesh, tp_bundle=tp_bundle)
    else:
        res, text_log = validate(args, cfg, params, tokenizer, dataset,
                                 mesh=mesh, tp_bundle=tp_bundle)

    if args.save_responses_path:
        os.makedirs(os.path.dirname(args.save_responses_path) or ".",
                    exist_ok=True)
        with open(args.save_responses_path, "w") as f:
            json.dump(text_log, f, indent=2)
        print(f"saved responses to {args.save_responses_path}")
    return res


if __name__ == "__main__":
    main()
