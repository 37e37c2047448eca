"""Differentiable box crop-and-resize (bilinear) for in-graph region losses.

The OCR text-perceptual training loss (sampling/ocr_loss.py) must extract
each sample's rendered-text region from a VAE-decoded image INSIDE the jitted
training step, with gradients flowing back through the crop into the latents.
Host-side PIL cropping (eval/ocr.py::prepare_crop) is neither jittable nor
differentiable, so this is the XLA-native equivalent: static output shape,
traced box coordinates, bilinear gather — maps onto plain gathers/adds that
XLA fuses with the surrounding elementwise work.

The reference has no in-graph perceptual loss (its text-perceptual machinery
is vestigial, RepText/pipeline_flux_controlnet.py:239-277); this op is
framework-original.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_and_resize(
    images: jax.Array, boxes: jax.Array, out_h: int, out_w: int
) -> jax.Array:
    """Bilinear crop of per-sample boxes to a fixed output size.

    Args:
      images: [B, H, W, C] float.
      boxes:  [B, 4] normalized (y0, x0, y1, x1) in [0, 1] image coordinates
              (fractions of H / W); may be traced values — gradients flow to
              both ``images`` and ``boxes``.
      out_h/out_w: static output size.

    Returns [B, out_h, out_w, C]. Pixel centers of the output grid sample the
    box interior (align_corners=False convention); coordinates are clamped at
    the image border (edge padding).
    """
    h, w = images.shape[1:3]

    def one(img, box):
        y0, x0, y1, x1 = box[0], box[1], box[2], box[3]
        ys = (y0 + (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
              * (y1 - y0)) * h - 0.5
        xs = (x0 + (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
              * (x1 - x0)) * w - 0.5
        ys = jnp.clip(ys, 0.0, h - 1.0)
        xs = jnp.clip(xs, 0.0, w - 1.0)
        yf = jnp.floor(ys)
        xf = jnp.floor(xs)
        wy = (ys - yf)[:, None, None]                       # [oh, 1, 1]
        wx = (xs - xf)[None, :, None]                       # [1, ow, 1]
        yi0 = yf.astype(jnp.int32)
        xi0 = xf.astype(jnp.int32)
        yi1 = jnp.minimum(yi0 + 1, h - 1)
        xi1 = jnp.minimum(xi0 + 1, w - 1)
        top = (img[yi0][:, xi0] * (1 - wx) + img[yi0][:, xi1] * wx)
        bot = (img[yi1][:, xi0] * (1 - wx) + img[yi1][:, xi1] * wx)
        return top * (1 - wy) + bot * wy                    # [oh, ow, C]

    return jax.vmap(one)(images, boxes)
