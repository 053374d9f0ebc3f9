"""Portable model export — the TPU-native counterpart of the reference's ONNX
export wrapper (model/segment_anything/utils/onnx.py, SURVEY §2.4): the
prompt-encoder + mask-decoder graph is serialized as StableHLO via jax.export,
so a serving runtime can run mask decoding against precomputed image
embeddings without Python model code.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models import sam as sam_mod


def export_mask_decoder(params, cfg: sam_mod.SamConfig, path: str, *,
                        max_prompts: int = 16,
                        dtype=jnp.float32) -> str:
    """Serialize decode_masks(text_embeds) to a StableHLO artifact.

    Input signature (static shapes, like the ONNX wrapper's fixed examples):
      image_embeddings [1, g, g, C], text_embeds [max_prompts, 1, C]
    Output: (low_res_masks [max_prompts, 1, 4g, 4g], iou [max_prompts, 1]).
    """
    g = cfg.prompt.image_embedding_size[0]
    c = cfg.prompt.embed_dim

    def fn(image_embeddings, text_embeds):
        return sam_mod.decode_masks(params, cfg, image_embeddings,
                                    text_embeds=text_embeds,
                                    multimask_output=False)

    exported = jax.export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((1, g, g, c), dtype),
        jax.ShapeDtypeStruct((max_prompts, 1, c), dtype))
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_exported(path: str):
    """Deserialize an exported artifact; returns a callable."""
    with open(path, "rb") as f:
        blob = f.read()
    exported = jax.export.deserialize(blob)
    return exported.call
