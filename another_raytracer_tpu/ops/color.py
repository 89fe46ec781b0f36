"""Radiance-to-pixel conversion.

Behavioral contract from the reference ``write_color`` (src/core/color.h:7-30):
divide the per-pixel radiance sum by spp, gamma-2 correct via sqrt, clamp each
channel to [0, 0.999], scale by 256 and truncate to the integer type.  The
clamp ceiling guarantees a max channel value of 255.  ``write_color_raw`` is
the linear (no gamma, no averaging) variant used for partial-sum frames in
sample-parallel mode (engine.h:395-406).
"""

from __future__ import annotations

import jax.numpy as jnp


def resolve(radiance_sum, samples_per_pixel):
    """Radiance sum [..., 3] -> gamma-corrected float in [0, 0.999]."""
    scale = 1.0 / samples_per_pixel
    c = jnp.sqrt(jnp.maximum(radiance_sum * scale, 0.0))
    return jnp.clip(c, 0.0, 0.999)


def to_uint8(radiance_sum, samples_per_pixel):
    """Radiance sum [..., 3] -> uint8 pixel values (color.h:13-22)."""
    return (256.0 * resolve(radiance_sum, samples_per_pixel)).astype(jnp.uint8)


def to_int32_gamma(radiance_sum, samples_per_pixel):
    """Radiance sum -> gamma-corrected int32 work values, as used by the
    adaptive mode's integer work frame (engine.h:172-173, 228-231)."""
    return (256.0 * resolve(radiance_sum, samples_per_pixel)).astype(jnp.int32)
