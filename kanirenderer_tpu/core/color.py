"""Color transfer functions and tonemap operators.

Reproduces the reference's shading-side color math:

* Reinhard tonemap ``c / (c + 1)`` — reference src/shader.wgsl:120-123.
* ACES filmic tonemap — reference src/shader_hdr.wgsl:254-265 (HDR surface).
* sRGB encode/decode — the wgpu build samples diffuse textures through an
  ``Rgba8UnormSrgb`` view (hardware sRGB→linear decode, src/texture.rs:128)
  and presents to an ``Rgba8UnormSrgb``/``Rgba16Float`` surface
  (linear→sRGB encode on present for LDR, src/lib.rs:321-329).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def reinhard_tonemap(c: Array) -> Array:
    """``c / (c + 1)`` (reference src/shader.wgsl:120-123)."""
    return c / (c + 1.0)


def aces_tonemap(c: Array) -> Array:
    """ACES filmic approximation (reference src/shader_hdr.wgsl:254-265)."""
    a, b, cc, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((c * (a * c + b)) / (c * (cc * c + d) + e), 0.0, 1.0)


def srgb_to_linear(c: Array) -> Array:
    """IEC 61966-2-1 sRGB EOTF (what an Rgba8UnormSrgb sample performs)."""
    c = jnp.asarray(c)
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c: Array) -> Array:
    """Inverse sRGB transfer (what presenting to an sRGB surface performs)."""
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)
