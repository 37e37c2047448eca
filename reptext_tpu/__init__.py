"""reptext-tpu: TPU-native (JAX/XLA/Pallas/pjit) multilingual visual-text-rendering framework.

A from-scratch rebuild of the capabilities of the RepText FLUX ControlNet stack
(reference: DeepNeuralAI313/Arabic-text-image-generation-RepText), designed TPU-first:

- ``reptext_tpu.conditioning``: CPU glyph-conditioning frontend (Arabic shaping/bidi,
  glyph rendering, canny edges, position/region masks).
- ``reptext_tpu.ops``: core tensor ops + Pallas TPU kernels (flash attention, RoPE).
- ``reptext_tpu.nn``: Flax modules (MMDiT blocks, embeddings, VAE, CLIP, T5).
- ``reptext_tpu.models``: FluxTransformer2D and RepText ControlNet assemblies.
- ``reptext_tpu.sampling``: FlowMatch Euler schedule + fused lax.scan denoise loop.
- ``reptext_tpu.parallel``: device mesh + sharding rules (dp/tp/sp over ICI).
- ``reptext_tpu.io``: torch-safetensors -> JAX weight conversion, orbax checkpoints.
- ``reptext_tpu.pipelines``: txt2img + inpaint pipelines mirroring the reference API
  surface (RepText/pipeline_flux_controlnet.py, pipeline_flux_controlnet_inpaint.py).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor the user's JAX_PLATFORMS even on hosted-TPU images whose
    # sitecustomize registers a PJRT tunnel plugin at interpreter start and
    # re-pins jax_platforms, silently overriding the env var: an explicit
    # config update after import wins over both (JAX_PLATFORMS=cpu must
    # mean CPU — wedged-tunnel dispatch hangs look like framework hangs).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # noqa: BLE001 — unknown platform: let jax error at use
        pass

from reptext_tpu.configs import (  # noqa: F401
    ControlNetConfig,
    FluxConfig,
    PipelineConfig,
    VAEConfig,
)
