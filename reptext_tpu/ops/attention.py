"""Attention dispatch: XLA einsum path and (TPU) Pallas flash-attention path.

The reference relies on torch SDPA/cuDNN inside diffusers attention processors;
here attention is a backend-dispatched pure function. The ``xla`` backend is an
einsum softmax with fp32 accumulation (XLA fuses it well and it is the
numerical reference); the ``pallas`` backend is a fused flash-attention TPU
kernel (reptext_tpu.ops.flash_attention) used for the 4608-token joint
text+image sequences that dominate the sampling hot loop
(SURVEY.md §3.1 "attention over 4608 tokens dominates").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_DEFAULT_BACKEND = "auto"


def set_default_backend(name: str) -> None:
    """Set process-wide attention backend: 'auto' | 'xla' | 'pallas'."""
    global _DEFAULT_BACKEND
    if name not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown attention backend {name!r}")
    _DEFAULT_BACKEND = name


def get_default_backend() -> str:
    return _DEFAULT_BACKEND


def _resolve(backend: Optional[str]) -> str:
    b = backend or _DEFAULT_BACKEND
    if b == "auto":
        # Pallas kernel requires TPU; fall back to XLA elsewhere (CPU tests).
        b = "pallas" if jax.default_backend() == "tpu" else "xla"
    return b


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """[B, H, S, D] q/k/v -> [B, H, S, D]; fp32 softmax accumulation."""
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    backend: Optional[str] = None,
    rope_cos: Optional[jax.Array] = None,
    rope_sin: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-head attention over [B, H, S, D] tensors (full, non-causal).

    When half-split rope tables are passed, q/k must be UNROTATED (half-split
    channel order); the pallas backend fuses the rotation into the kernel
    (rotated q/k never round-trip HBM) and the xla backend rotates explicitly.
    """
    b = _resolve(backend)
    if b == "xla":
        if rope_cos is not None:
            from reptext_tpu.ops.rope import apply_rope_half

            q = apply_rope_half(q, rope_cos, rope_sin)
            k = apply_rope_half(k, rope_cos, rope_sin)
        return xla_attention(q, k, v)
    if rope_cos is not None:
        from reptext_tpu.ops.flash_attention import flash_attention_rope

        return flash_attention_rope(q, k, v, rope_cos, rope_sin)
    from reptext_tpu.ops.flash_attention import flash_attention

    return flash_attention(q, k, v)
