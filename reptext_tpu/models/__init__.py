"""Model assemblies: FLUX MMDiT transformer and RepText ControlNet."""

from reptext_tpu.models.flux import FluxTransformer2D  # noqa: F401
from reptext_tpu.models.controlnet import RepTextControlNet  # noqa: F401
from reptext_tpu.models.multi_controlnet import (  # noqa: F401
    ControlNetEntry,
    MultiControlNet,
)
