"""SAM prompt encoder, TPU-native.

Functional rewrite of model/segment_anything/modeling/prompt_encoder.py:16-238,
including the WalkGPT modification: `text_embeds` are appended to the sparse
prompt embeddings (prompt_encoder.py:176-177) — that is the only prompt type
the WalkGPT pipeline uses, but points/boxes/masks are kept for the
predictor/AMG capability surface.

Layout: dense embeddings and the dense positional encoding are NHWC
([B, H, W, C]); the random-Fourier PE matrix is a non-trainable buffer kept in
the param tree so checkpoint converters can restore the exact pretrained one.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import nn
from ..core.config import PromptEncoderConfig


def init(key, cfg: PromptEncoderConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 10)
    d = cfg.embed_dim
    mc = cfg.mask_in_chans
    return {
        # PositionEmbeddingRandom gaussian matrix (buffer; scale=1)
        "pe_gaussian": jax.random.normal(keys[0], (2, d // 2), jnp.float32),
        "point_embeddings": [nn.embedding_init(keys[1 + i], 1, d, std=1.0, dtype=dtype)
                             for i in range(4)],
        "not_a_point_embed": nn.embedding_init(keys[5], 1, d, std=1.0, dtype=dtype),
        "no_mask_embed": nn.embedding_init(keys[6], 1, d, std=1.0, dtype=dtype),
        "mask_downscaling": {
            "conv1": nn.conv2d_init(keys[7], 1, mc // 4, (2, 2), dtype=dtype),
            "ln1": nn.layer_norm_init(mc // 4, dtype),
            "conv2": nn.conv2d_init(keys[8], mc // 4, mc, (2, 2), dtype=dtype),
            "ln2": nn.layer_norm_init(mc, dtype),
            "conv3": nn.conv2d_init(keys[9], mc, d, (1, 1), dtype=dtype),
        },
    }


def _pe_encoding(params, coords: jnp.ndarray) -> jnp.ndarray:
    """coords in [0,1]^2, shape [..., 2] -> [..., embed_dim]."""
    coords = 2.0 * coords.astype(jnp.float32) - 1.0
    coords = coords @ params["pe_gaussian"]
    coords = 2.0 * np.pi * coords
    return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


def get_dense_pe(params, cfg: PromptEncoderConfig) -> jnp.ndarray:
    """Positional encoding grid [1, H, W, C] (prompt_encoder.py:67-76)."""
    h, w = cfg.image_embedding_size
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # [h, w, 2] (x,y)
    return _pe_encoding(params, grid)[None]


def embed_points(params, cfg: PromptEncoderConfig, points: jnp.ndarray,
                 labels: jnp.ndarray, pad: bool) -> jnp.ndarray:
    pts = points.astype(jnp.float32) + 0.5
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((pts.shape[0], 1, 2))], axis=1)
        labels = jnp.concatenate(
            [labels, -jnp.ones((labels.shape[0], 1), labels.dtype)], axis=1)
    coords = pts / jnp.array([cfg.input_image_size[1], cfg.input_image_size[0]],
                             jnp.float32)
    pe = _pe_encoding(params, coords)
    lab = labels[..., None]
    pe = jnp.where(lab == -1, params["not_a_point_embed"]["w"][0], pe)
    pe = jnp.where(lab == 0, pe + params["point_embeddings"][0]["w"][0], pe)
    pe = jnp.where(lab == 1, pe + params["point_embeddings"][1]["w"][0], pe)
    return pe


def embed_boxes(params, cfg: PromptEncoderConfig, boxes: jnp.ndarray) -> jnp.ndarray:
    coords = (boxes.astype(jnp.float32) + 0.5).reshape(-1, 2, 2)
    coords = coords / jnp.array([cfg.input_image_size[1], cfg.input_image_size[0]],
                                jnp.float32)
    pe = _pe_encoding(params, coords)
    pe = pe.at[:, 0].add(params["point_embeddings"][2]["w"][0])
    pe = pe.at[:, 1].add(params["point_embeddings"][3]["w"][0])
    return pe


def embed_masks(params, masks: jnp.ndarray) -> jnp.ndarray:
    """masks: [B, 4H, 4W, 1] NHWC -> dense embeddings [B, H, W, C]."""
    md = params["mask_downscaling"]
    x = nn.conv2d(md["conv1"], masks, stride=(2, 2), padding="VALID")
    x = nn.gelu_exact(nn.layer_norm2d(md["ln1"], x))
    x = nn.conv2d(md["conv2"], x, stride=(2, 2), padding="VALID")
    x = nn.gelu_exact(nn.layer_norm2d(md["ln2"], x))
    return nn.conv2d(md["conv3"], x, padding="VALID")


def apply(params, cfg: PromptEncoderConfig, *,
          points: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
          boxes: Optional[jnp.ndarray] = None,
          masks: Optional[jnp.ndarray] = None,
          text_embeds: Optional[jnp.ndarray] = None
          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (sparse [B, N, C], dense [B, H, W, C])."""
    if points is not None:
        bs = points[0].shape[0]
    elif boxes is not None:
        bs = boxes.shape[0]
    elif masks is not None:
        bs = masks.shape[0]
    elif text_embeds is not None:
        bs = text_embeds.shape[0]
    else:
        bs = 1

    sparse_parts = []
    if points is not None:
        sparse_parts.append(embed_points(params, cfg, points[0], points[1],
                                         pad=(boxes is None)))
    if boxes is not None:
        sparse_parts.append(embed_boxes(params, cfg, boxes))
    if text_embeds is not None:
        sparse_parts.append(text_embeds)
    if sparse_parts:
        sparse = jnp.concatenate(sparse_parts, axis=1)
    else:
        sparse = jnp.zeros((bs, 0, cfg.embed_dim))

    if masks is not None:
        dense = embed_masks(params, masks)
    else:
        h, w = cfg.image_embedding_size
        dense = jnp.broadcast_to(params["no_mask_embed"]["w"].reshape(1, 1, 1, -1),
                                 (bs, h, w, cfg.embed_dim))
    return sparse, dense
