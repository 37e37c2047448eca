"""Latent patchification and token-grid utilities.

FLUX packs 16-channel f=8 VAE latents into tokens of 64 features by 2x2
patchification; sequence position carries a 3-axis id (const, row, col) used by
3D RoPE. Semantics match the reference exactly so weights/conditioning transfer:

- pack:   reference RepText/pipeline_flux_controlnet.py:550-555 (_pack_latents)
- unpack: reference RepText/pipeline_flux_controlnet.py:557-570 (_unpack_latents)
- ids:    reference RepText/pipeline_flux_controlnet.py:535-546 (_prepare_latent_image_ids)
- mask:   reference RepText/pipeline_flux_controlnet.py:1007-1013 (bilinear 1/16 downsample)

All functions are shape-polymorphic pure jnp and safe under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_latents(latents: jax.Array) -> jax.Array:
    """[B, C, H, W] -> [B, (H/2)*(W/2), C*4] with feature order (c, dy, dx).

    Matches the torch view/permute sequence of the reference: feature index
    = c*4 + dy*2 + dx, channel-major.
    """
    b, c, h, w = latents.shape
    x = latents.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, H/2, W/2, C, 2, 2]
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(latents: jax.Array, height: int, width: int) -> jax.Array:
    """[B, S, C*4] -> [B, C, height, width] (height/width in latent pixels)."""
    b, s, cf = latents.shape
    c = cf // 4
    h2, w2 = height // 2, width // 2
    x = latents.reshape(b, h2, w2, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)  # [B, C, H/2, 2, W/2, 2]
    return x.reshape(b, c, height, width)


def prepare_latent_image_ids(height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """Token position ids [(height/2)*(width/2), 3]: (0, row, col).

    ``height``/``width`` are latent-pixel dims (image dims // vae_scale_factor);
    ids are on the 2x2-patch token grid. Text ids are all-zero (seq, 3) and are
    built by callers.
    """
    h2, w2 = height // 2, width // 2
    row = jnp.broadcast_to(jnp.arange(h2, dtype=dtype)[:, None], (h2, w2))
    col = jnp.broadcast_to(jnp.arange(w2, dtype=dtype)[None, :], (h2, w2))
    zeros = jnp.zeros((h2, w2), dtype=dtype)
    ids = jnp.stack([zeros, row, col], axis=-1)
    return ids.reshape(h2 * w2, 3)


def _bilinear_resize_align_corners_false(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize of [..., H, W] matching torch F.interpolate(align_corners=False).

    jax.image.resize('linear') uses half-pixel centers, which is exactly
    torch's align_corners=False convention.
    """
    out_shape = img.shape[:-2] + (out_h, out_w)
    return jax.image.resize(img, out_shape, method="linear")


def downsample_region_mask(mask: jax.Array, latent_height: int, latent_width: int) -> jax.Array:
    """Pixel-space region mask [H, W] (0..1) -> per-token mask [S, 1].

    The reference bilinearly downsamples by 1/16 (vae f=8 x patch 2) and
    reshapes to (tokens, 1) to gate ControlNet residuals per token
    (RepText/pipeline_flux_controlnet.py:1007-1013).
    """
    h2, w2 = latent_height // 2, latent_width // 2
    m = _bilinear_resize_align_corners_false(mask.astype(jnp.float32), h2, w2)
    return m.reshape(h2 * w2, 1)


def glyph_latent_blend(
    noise: jax.Array,
    glyph_latents: jax.Array,
    glyph_mask: jax.Array,
    scale: float = 0.10,
) -> jax.Array:
    """Glyph-latent initialization: inside the glyph mask, blend VAE(glyph) into noise.

    result = where(mask, scale * glyph_latents + noise, noise)

    Args:
      noise: [B, C, H, W] initial gaussian latents.
      glyph_latents: [B, C, H, W] VAE-encoded, scaled glyph canvas latents.
      glyph_mask: [B, 1, H, W] binarized glyph mask on the latent grid.
      scale: blend weight for the glyph latent (reference uses 0.10,
        RepText/pipeline_flux_controlnet_inpaint.py:635-649).
    """
    blended = scale * glyph_latents + noise
    return jnp.where(glyph_mask > 0.5, blended, noise)


def binarize_glyph_mask_to_latent(
    glyph_pixels: jax.Array, latent_height: int, latent_width: int
) -> jax.Array:
    """Glyph canvas pixels [H, W] (any >0 means ink) -> [1, H_lat, W_lat] {0,1} mask.

    Mirrors the reference: pixel>0 mask, bilinear resize to latent grid, binarize
    (RepText/pipeline_flux_controlnet_inpaint.py:635-644).
    """
    m = (glyph_pixels > 0).astype(jnp.float32)
    m = _bilinear_resize_align_corners_false(m, latent_height, latent_width)
    return (m > 0).astype(jnp.float32)[None]
