"""LoRA merge / export CLI — the working counterpart of
merge_lora_weights_and_save_hf_model.py (which, as shipped, imports a
nonexistent model.PixelLM — SURVEY WART-5; this implements the intended
transform, §3.4):

    load full fine-tuned state -> fold LoRA (W' = W + scale*A@B) ->
    drop the CLIP vision tower -> save a merged checkpoint.

Pure host-side pytree transform; no devices needed.

  python -m walkgpt_tpu.runtime.merge_lora_cli \
      --weight ckpt/mp_rank_00_model_states.pt --model_size 7b \
      --save_path merged_ckpt --lora_alpha 16
"""
from __future__ import annotations

import argparse
import os
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description="WalkGPT-TPU LoRA merge")
    p.add_argument("--weight", required=True,
                   help="full state dict (.pt) or orbax dir")
    p.add_argument("--model_size", default="7b",
                   choices=["tiny", "demo", "1b", "7b", "13b"])
    p.add_argument("--save_path", required=True)
    p.add_argument("--lora_alpha", default=16.0, type=float)
    p.add_argument("--lora_r", default=8, type=int)
    p.add_argument("--keep_vision_tower", action="store_true", default=False)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    import jax
    from ..core.config import (demo_config, flagship_1b_config, tiny_config,
                               walkgpt_7b_config, walkgpt_13b_config)
    from ..models import walkgpt
    from . import checkpoint as ck

    builders = {"tiny": tiny_config, "demo": demo_config,
                "1b": flagship_1b_config, "7b": walkgpt_7b_config,
                "13b": walkgpt_13b_config}
    cfg = builders[args.model_size]()
    params = walkgpt.init(jax.random.PRNGKey(0), cfg)

    if os.path.isdir(args.weight):
        params = ck.load_orbax(args.weight, like=params)
    else:
        sd = ck.load_torch_state_dict(args.weight)
        converted = ck.convert_walkgpt_state(sd, cfg, lora_alpha=args.lora_alpha)
        params = ck.load_into(params, converted)

    params["llm"] = ck.merge_lora(params["llm"])
    if not args.keep_vision_tower:
        params.pop("clip", None)          # strip vision_tower.* (§3.4)

    ck.save_orbax(args.save_path, params)
    print(f"merged checkpoint saved to {args.save_path}")
    return params


if __name__ == "__main__":
    main()
