"""Reference-side parity recorder — runs in an environment where
rafiibnsultan/WalkGPT runs (CUDA + its requirements.txt; NOT this image),
and dumps the SAME .npz schema runtime/parity_cli.py consumes:

    sample_keys : [N] str
    tokens_{i}  : [T_i] int64   greedy generated ids (pre-truncation)
    masks_{i}   : [M_i, H, W] uint8 binarized masks

Usage (mirrors the reference eval invocation, instructions.md:45):

    python benchmarks/record_reference_outputs.py \
        --reference /path/to/WalkGPT \
        --weight runs/walkgpt-13b/ckpt_model/.../mp_rank_00_model_states.pt \
        --dataset_dir /path/to/datasets --samples 8 --out ref_parity.npz

Then on the TPU side:

    python -m walkgpt_tpu.runtime.parity_cli record --out ours.npz \
        --weight <same .pt> --dataset_dir <same> --samples 8 --model_size 13b
    python -m walkgpt_tpu.runtime.parity_cli compare --a ours.npz \
        --b ref_parity.npz            # asserts token identity + gIoU <= 1e-3

This script only READS the reference; it follows the generation path of
evaluation_walkgpt.py:535-608 (SAM->MSQP tokens, greedy, max_new_tokens 512)
and the mask path of model/walkgpt.py evaluate() (:607-746).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", required=True,
                   help="path to the WalkGPT checkout")
    p.add_argument("--weight", required=True)
    p.add_argument("--version", default="",
                   help="HF tokenizer/base model path")
    p.add_argument("--dataset_dir", required=True)
    p.add_argument("--samples", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=512)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    sys.path.insert(0, args.reference)

    import torch  # noqa: E402 — reference environment

    # the reference's own builders (evaluation_walkgpt.py:163-335)
    import evaluation_walkgpt as ev  # type: ignore

    ns = argparse.Namespace(
        version=args.version, weight=args.weight,
        model_max_length=2048, vision_tower=None, local_rank=0,
        precision="bf16", load_in_8bit=False, load_in_4bit=False,
        seg_token_num=1, image_feature_scale_num=1,
        vision_pretrained=None, out_dim=256, use_mm_start_end=True,
        conv_type="llava_v1")
    tokenizer = ev.build_tokenizer(ns)
    model = ev.build_model(ns, tokenizer)
    model.eval().cuda()

    from utils.PAVE_dataset import PAVEValDataset  # type: ignore
    ds = PAVEValDataset(args.dataset_dir, tokenizer, None,
                        image_size=1024)

    out, keys = {}, []
    with torch.no_grad():
        for i in range(min(args.samples, len(ds))):
            item = ds[i]
            # one sample through the rank-0 generation path
            # (_prepare_sam_tokens + _build_question_prompts + generate,
            #  evaluation_walkgpt.py:443-577), then evaluate() for masks
            tokens, masks = ev.generate_for_parity(model, tokenizer, item,
                                                   args.max_new_tokens) \
                if hasattr(ev, "generate_for_parity") else \
                _generate_fallback(ev, model, tokenizer, item,
                                   args.max_new_tokens)
            keys.append(f"{i}:{os.path.basename(str(item[0]))}")
            out[f"tokens_{i}"] = np.asarray(tokens, np.int64)
            out[f"masks_{i}"] = np.asarray(masks, np.uint8)
            print(f"[ref record] {keys[-1]}: {len(tokens)} tokens, "
                  f"{len(masks)} masks", flush=True)
    out["sample_keys"] = np.array(keys)
    np.savez_compressed(args.out, **out)
    print(f"recorded {len(keys)} samples -> {args.out}")


def _generate_fallback(ev, model, tokenizer, item, max_new):
    """Inline re-statement of evaluation_walkgpt.py:535-608 for one sample:
    greedy generate from SAM-MSQP tokens, then SEG masks via
    model.evaluate()'s decode path. Kept minimal — adapt field unpacking to
    the PAVEValDataset 12-tuple (utils/PAVE_dataset.py:407-482)."""
    import torch
    (image_path, images, images_clip, conversations, masks, label,
     resize, questions, sampled_classes, _, _, inference) = item
    images = images.unsqueeze(0).cuda().bfloat16()
    sam_tokens = ev._prepare_sam_tokens(model, images)
    prompts = ev._build_question_prompts([questions[0]], tokenizer)
    input_ids = prompts["input_ids"].cuda()
    out = model.generate(images=sam_tokens, input_ids=input_ids,
                         max_new_tokens=max_new, num_beams=1,
                         output_hidden_states=True,
                         return_dict_in_generate=True)
    seq = out.sequences[0, input_ids.shape[1]:]
    res = model.evaluate(images_clip.unsqueeze(0).cuda().bfloat16(), images,
                         input_ids, resize_list=[resize],
                         original_size_list=[label.shape],
                         max_new_tokens=max_new, tokenizer=tokenizer)
    pred_masks = [(m > 0).cpu().numpy() for m in res[1]]
    return seq.cpu().numpy(), np.stack(pred_masks) if pred_masks else \
        np.zeros((0,) + tuple(label.shape), np.uint8)


if __name__ == "__main__":
    main()
