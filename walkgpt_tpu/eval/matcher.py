"""Hungarian mask matching for multi-[SEG] evaluation.

Semantics follow utils/matcher.py `match_pred` (:93-133): both mask sets are
point-sampled at 12,544 shared random locations (bilinear grid-sample,
align_corners=False), costs are batch BCE + batch dice (the +1-smoothed
variant, :29-41), and the assignment is scipy linear_sum_assignment on host.

TPU split: point sampling + cost matrices run on device (jnp); the tiny
assignment runs on host (scipy) — the natural division of labor.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def grid_sample_bilinear(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """torch F.grid_sample(align_corners=False, padding_mode='zeros') on
    [N, H, W] images at [P, 2] normalized coords in [-1, 1] ((x, y) order).
    Returns [N, P]."""
    n, h, w = img.shape
    x = (coords[:, 0] + 1.0) * w / 2.0 - 0.5
    y = (coords[:, 1] + 1.0) * h / 2.0 - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def fetch(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = img[:, yi_c, xi_c]                       # [N, P]
        return jnp.where(inside[None, :], vals, 0.0)

    v00 = fetch(y0, x0)
    v01 = fetch(y0, x0 + 1)
    v10 = fetch(y0 + 1, x0)
    v11 = fetch(y0 + 1, x0 + 1)
    return (v00 * (1 - dx) * (1 - dy) + v01 * dx * (1 - dy)
            + v10 * (1 - dx) * dy + v11 * dx * dy)


def batch_dice_cost(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """[N, P] logits vs [M, P] binary -> [N, M] (+1-smoothed dice)."""
    p = jax.nn.sigmoid(inputs.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    numerator = 2.0 * (p @ t.T)
    denominator = p.sum(-1)[:, None] + t.sum(-1)[None, :]
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


def batch_bce_cost(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """[N, P] logits vs [M, P] binary -> [N, M] mean BCE under each pairing."""
    x = inputs.astype(jnp.float32)
    hw = x.shape[1]
    pos = jnp.maximum(x, 0) - x + jnp.log1p(jnp.exp(-jnp.abs(x)))   # BCE vs 1
    neg = jnp.maximum(x, 0) + jnp.log1p(jnp.exp(-jnp.abs(x)))       # BCE vs 0
    t = targets.astype(jnp.float32)
    return (pos @ t.T + neg @ (1.0 - t).T) / hw


def match_pred(out_mask: np.ndarray, tgt_mask: np.ndarray, *,
               num_points: int = 12544, seed: int = 0
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Hungarian assignment between predicted mask logits [N, H, W] and GT
    binary masks [M, H', W']. Returns (pred_indices, tgt_indices)."""
    from scipy.optimize import linear_sum_assignment
    rng = np.random.RandomState(seed)
    pts = jnp.asarray(rng.rand(num_points, 2).astype(np.float32))
    coords = 2.0 * pts - 1.0
    out_s = grid_sample_bilinear(jnp.asarray(out_mask, jnp.float32), coords)
    tgt_s = grid_sample_bilinear(jnp.asarray(tgt_mask, jnp.float32), coords)
    cost = batch_bce_cost(out_s, tgt_s) + batch_dice_cost(out_s, tgt_s)
    return linear_sum_assignment(np.asarray(cost))
