"""Core tensor ops and Pallas TPU kernels."""

from reptext_tpu.ops.latents import (  # noqa: F401
    pack_latents,
    unpack_latents,
    prepare_latent_image_ids,
    downsample_region_mask,
)
from reptext_tpu.ops.rope import (  # noqa: F401
    rope_cos_sin,
    apply_rope,
    rope_cos_sin_half,
    apply_rope_half,
    deinterleave_perm,
)
