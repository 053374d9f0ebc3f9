"""Sam composition: encoder + prompt encoder + mask decoder, with preprocess /
postprocess (model/segment_anything/modeling/sam.py:18-184) and the
build_sam_vit_{h,l,b} registry (build_sam.py:15-108).

In the WalkGPT pipeline image normalization happens in the data layer with
PAVE stats; `preprocess` here carries the upstream SAM ImageNet-ish stats for
the predictor/AMG capability surface.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import (MaskDecoderConfig, PromptEncoderConfig,
                           SAMEncoderConfig, SAM_VIT_B, SAM_VIT_H, SAM_VIT_L)
from ..ops.resize import bilinear_resize
from . import sam_decoder, sam_encoder, sam_prompt

SAM_PIXEL_MEAN = jnp.array([123.675, 116.28, 103.53], jnp.float32)
SAM_PIXEL_STD = jnp.array([58.395, 57.12, 57.375], jnp.float32)


@dataclasses.dataclass(frozen=True)
class SamConfig:
    encoder: SAMEncoderConfig = SAM_VIT_H
    prompt: PromptEncoderConfig = PromptEncoderConfig()
    decoder: MaskDecoderConfig = MaskDecoderConfig()
    mask_threshold: float = 0.0

    @classmethod
    def vit_h(cls): return cls(encoder=SAM_VIT_H)
    @classmethod
    def vit_l(cls): return cls(encoder=SAM_VIT_L)
    @classmethod
    def vit_b(cls): return cls(encoder=SAM_VIT_B)

    @classmethod
    def for_encoder(cls, enc: SAMEncoderConfig, **kw):
        grid = enc.grid
        return cls(encoder=enc,
                   prompt=PromptEncoderConfig(
                       embed_dim=enc.out_chans,
                       image_embedding_size=(grid, grid),
                       input_image_size=(enc.img_size, enc.img_size),
                       mask_in_chans=max(4, enc.out_chans // 16)),
                   decoder=MaskDecoderConfig(
                       transformer_dim=enc.out_chans,
                       transformer_mlp_dim=max(64, enc.out_chans * 8),
                       transformer_num_heads=min(8, enc.out_chans // 16)),
                   **kw)


def init(key, cfg: SamConfig, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "image_encoder": sam_encoder.init(k1, cfg.encoder, dtype),
        "prompt_encoder": sam_prompt.init(k2, cfg.prompt, dtype),
        "mask_decoder": sam_decoder.init(k3, cfg.decoder, dtype),
    }


def encode_image(params, cfg: SamConfig, images: jnp.ndarray, *,
                 use_flash: bool = False,
                 fast_windowed: bool = False,
                 fast_gelu: bool = False) -> jnp.ndarray:
    """[B, S, S, 3] -> [B, grid, grid, 256] NHWC."""
    return sam_encoder.apply(params["image_encoder"], cfg.encoder, images,
                             use_flash=use_flash, fast_windowed=fast_windowed,
                             fast_gelu=fast_gelu)


def decode_masks(params, cfg: SamConfig, image_embeddings: jnp.ndarray, *,
                 text_embeds: Optional[jnp.ndarray] = None,
                 points=None, boxes=None, masks=None,
                 multimask_output: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prompt-encode + mask-decode. Returns (low_res_masks [B,T,4g,4g], iou)."""
    sparse, dense = sam_prompt.apply(params["prompt_encoder"], cfg.prompt,
                                     points=points, boxes=boxes, masks=masks,
                                     text_embeds=text_embeds)
    image_pe = sam_prompt.get_dense_pe(params["prompt_encoder"], cfg.prompt)
    return sam_decoder.apply(params["mask_decoder"], cfg.decoder,
                             image_embeddings=image_embeddings,
                             image_pe=image_pe,
                             sparse_prompt=sparse,
                             dense_prompt=dense,
                             multimask_output=multimask_output)


def preprocess(images: jnp.ndarray, img_size: int) -> jnp.ndarray:
    """Upstream SAM normalize + bottom/right pad, NHWC (sam.py:156-164)."""
    x = (images - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
    h, w = x.shape[1], x.shape[2]
    return jnp.pad(x, ((0, 0), (0, img_size - h), (0, img_size - w), (0, 0)))


def postprocess_masks(masks: jnp.ndarray, *, img_size: int,
                      input_size: Tuple[int, int],
                      original_size: Tuple[int, int]) -> jnp.ndarray:
    """Upscale low-res masks to img_size, crop padding, resize to original
    (sam.py:166-184). masks: [B, T, h, w] -> [B, T, *original_size]."""
    b, t = masks.shape[:2]
    x = masks.reshape(b * t, *masks.shape[2:])[..., None]     # [BT, h, w, 1]
    x = bilinear_resize(x, (img_size, img_size))
    x = x[:, :input_size[0], :input_size[1]]
    x = bilinear_resize(x, tuple(original_size))
    return x[..., 0].reshape(b, t, *original_size)
