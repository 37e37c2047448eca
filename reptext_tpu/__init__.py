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

from reptext_tpu.configs import (  # noqa: F401
    ControlNetConfig,
    FluxConfig,
    PipelineConfig,
    VAEConfig,
)
