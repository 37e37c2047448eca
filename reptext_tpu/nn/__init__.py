"""Flax neural-network modules: layers, embeddings, MMDiT blocks, encoders."""

from reptext_tpu.nn.layers import (  # noqa: F401
    AdaLayerNormContinuous,
    AdaLayerNormZero,
    AdaLayerNormZeroSingle,
    FeedForward,
    RMSNorm,
)
from reptext_tpu.nn.embeddings import (  # noqa: F401
    CombinedTimestepTextEmbed,
    MLPEmbedder,
    timestep_embedding,
)
from reptext_tpu.nn.blocks import (  # noqa: F401
    JointTransformerBlock,
    SingleTransformerBlock,
)
