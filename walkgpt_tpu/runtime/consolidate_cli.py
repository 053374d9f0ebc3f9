"""Checkpoint consolidation CLI — the TPU-native counterpart of the
reference's model/llava_walkgpt/model/consolidate.py (load a sharded/derived
checkpoint, re-save canonical). Here: any supported layout (Orbax dir, torch
mp_rank_00_model_states.pt, HF .bin/.safetensors) -> one canonical Orbax
checkpoint, LoRA merged.

Usage:
  python -m walkgpt_tpu.runtime.consolidate_cli --src ckpt/... --dst out/ \
      --model_size 13b
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="WalkGPT-TPU checkpoint consolidate")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--model_size", default="13b",
                   choices=["tiny", "demo", "1b", "7b", "13b"])
    p.add_argument("--seg_token_id", default=32008, type=int)
    p.add_argument("--with_init", action="store_true", default=False,
                   help="overlay onto a random-init tree (fills subsystems "
                   "absent from the source checkpoint)")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from ..core.config import (demo_config, flagship_1b_config, tiny_config,
                               walkgpt_13b_config, walkgpt_7b_config)
    from . import checkpoint as ck

    cfg = {"tiny": tiny_config, "demo": demo_config, "1b": flagship_1b_config,
           "7b": walkgpt_7b_config, "13b": walkgpt_13b_config}[
        args.model_size](seg_token_id=args.seg_token_id)
    init_params = None
    if args.with_init:
        import jax
        from ..models import walkgpt
        init_params = walkgpt.init(jax.random.PRNGKey(0), cfg)
    tree = ck.consolidate(args.src, args.dst, cfg, init_params=init_params)
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(tree))
    print(f"consolidated {args.src} -> {args.dst} ({n:,} params)")
    return tree


if __name__ == "__main__":
    main()
