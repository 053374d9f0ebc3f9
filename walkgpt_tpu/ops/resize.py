"""Device-side resize ops with torch-compatible numerics.

torch F.interpolate(mode="bilinear", align_corners=False, antialias=False)
uses half-pixel centers — identical to jax.image.resize(method="linear",
antialias=False). torch mode="nearest" uses floor(i * in/out) asymmetric
indexing, which differs from jax's nearest; implemented here via explicit
gather so label maps match bit-for-bit.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bilinear_resize(x: jnp.ndarray, size_hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize the trailing-2-of-3 spatial dims of [..., H, W, C] NHWC tensors.

    Matches torch F.interpolate(bilinear, align_corners=False); computed in
    fp32 and cast back (the reference upcasts masks to float for interp)."""
    *lead, h, w, c = x.shape
    out_shape = (*lead, size_hw[0], size_hw[1], c)
    y = jax.image.resize(x.astype(jnp.float32), out_shape, method="linear",
                         antialias=False)
    return y.astype(x.dtype)


def nearest_resize(x: jnp.ndarray, size_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') floor-indexing for [..., H, W] arrays."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = size_hw
    rows = jnp.floor(jnp.arange(h_out) * (h_in / h_out)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w_out) * (w_in / w_out)).astype(jnp.int32)
    return x[..., rows[:, None], cols[None, :]]
