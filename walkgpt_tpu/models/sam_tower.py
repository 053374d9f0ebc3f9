"""SAMVisionTower — thin wrapper exposing the SAM encoder as a CLIP-like
vision tower (reference model/sam_tower.py:4-28: flattened tokens + spatial
feature maps + grid metadata). Defined-but-unused by the reference drivers;
kept for capability-surface parity."""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..core.config import SAMEncoderConfig
from . import sam_encoder


class SAMTowerOutput(NamedTuple):
    tokens: jnp.ndarray       # [B, g*g, C]
    spatial: jnp.ndarray      # [B, g, g, C]
    grid: Tuple[int, int]


class SAMVisionTower:
    def __init__(self, params, cfg: SAMEncoderConfig, *, use_flash: bool = False):
        self.params = params
        self.cfg = cfg
        self.use_flash = use_flash
        self.hidden_size = cfg.out_chans

    @property
    def num_patches(self) -> int:
        return self.cfg.grid ** 2

    def __call__(self, images: jnp.ndarray) -> SAMTowerOutput:
        feats = sam_encoder.apply(self.params, self.cfg, images,
                                  use_flash=self.use_flash)
        b, g1, g2, c = feats.shape
        return SAMTowerOutput(tokens=feats.reshape(b, g1 * g2, c),
                              spatial=feats, grid=(g1, g2))
