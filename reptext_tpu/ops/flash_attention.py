"""Pallas TPU fused attention kernel for MMDiT joint sequences.

Replaces the cuDNN/SDPA attention the reference gets from torch (SURVEY.md §2:
"the new build's native-equivalent work is the Pallas/XLA kernel layer"). The
FLUX hot loop attends over a fixed joint sequence of 512 text + H*W/16 image
tokens (4608 at 1024²) with head_dim 128 — small enough that one head's full
K/V fits VMEM, so the kernel keeps whole K/V per (batch, head) resident and
tiles only queries:

- grid (B, H, S/block_q); K/V blocks are VMEM-resident per grid step;
- logits computed on the MXU in fp32 (`preferred_element_type`), softmax in
  fp32 on the VPU, probs cast back to the input dtype for the PV matmul;
- arbitrary sequence lengths handled by padding to the 128-lane tile and
  masking padded keys with -inf inside the kernel (static `valid_len`).

A streaming (online-softmax) variant for very long sequences (>=2048² images)
is the ring-attention growth path; at FLUX native resolutions this formulation
is already HBM-bandwidth optimal since K/V are read once per query tile row.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Above this joint length the single-pass kernel's [block_q, S] logits tile
# no longer fits VMEM alongside whole K/V; switch to the streaming kernel.
_SINGLE_PASS_MAX_SEQ = 6144


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, valid_len: int, scale: float):
    q = q_ref[0, 0]  # [block_q, D]
    k = k_ref[0, 0]  # [S_pad, D]
    v = v_ref[0, 0]  # [S_pad, D]

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [block_q, S_pad]

    if valid_len < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < valid_len, logits, -jnp.inf)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _streaming_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                      *, valid_len: int, scale: float, block_kv: int):
    """Online-softmax flash attention: kv chunks stream through VMEM.

    Grid (B, H, q_blocks, kv_blocks) with kv innermost; scratch (running max,
    normalizer, fp32 accumulator) persists across the kv dimension.
    """
    kv_idx = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]            # [block_q, D]
    k = k_ref[0, 0]            # [block_kv, D]
    v = v_ref[0, 0]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                   # [block_q, block_kv]

    first_invalid = valid_len - kv_idx * block_kv
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < first_invalid, logits, -jnp.inf)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)

    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new

    @pl.when(kv_idx == n_kv - 1)
    def _():
        o_ref[0, 0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _streaming_flash(q, k, v, block_q, block_kv, interpret):
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    s_pad = _round_up(_round_up(s, block_q), block_kv)
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    grid = (b, h, s_pad // block_q, s_pad // block_kv)
    kernel = functools.partial(
        _streaming_kernel, valid_len=s, scale=scale, block_kv=block_kv
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * s_pad * s_pad * d,
            bytes_accessed=4 * b * h * s_pad * d * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(q, k, v)
    if s_pad != s:
        out = out[:, :, :s, :]
    return out


def _flash_attention_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Full (non-causal) MHA: [B, H, S, D] x3 -> [B, H, S, D].

    Single-pass kernel (whole K/V VMEM-resident) at FLUX-native lengths;
    streaming online-softmax kernel beyond ~6k tokens (>=1536^2 images).
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    b, h, s, d = q.shape
    if s > _SINGLE_PASS_MAX_SEQ:
        return _streaming_flash(q, k, v, block_q, 512, interpret)
    scale = 1.0 / math.sqrt(d)

    s_pad = _round_up(s, 128)
    block_q = min(block_q, s_pad)
    s_pad = _round_up(s_pad, block_q)
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    grid = (b, h, s_pad // block_q)
    kernel = functools.partial(_attn_kernel, valid_len=s, scale=scale)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * s_pad * s_pad * d,
            bytes_accessed=(3 * b * h * s_pad * d + b * h * s_pad * d) * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(q, k, v)

    if s_pad != s:
        out = out[:, :, :s, :]
    return out


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, fp32 einsum backward.
#
# Training (flow-matching fine-tune / ControlNet training) differentiates
# through attention; the Pallas forward has no auto-derived VJP, so the
# backward pass recomputes softmax(qk^T) with XLA einsums in fp32 and applies
# the standard attention gradient identities. A streaming (flash) backward
# kernel is the optimization path once training becomes the bottleneck.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    return _flash_attention_impl(q, k, v, block_q, interpret)


def _fwd(q, k, v, block_q, interpret):
    return _flash_attention_impl(q, k, v, block_q, interpret), (q, k, v)


def _bwd(block_q, interpret, residuals, g):
    q, k, v = residuals
    dtype = q.dtype
    qf, kf, vf, gf = (x.astype(jnp.float32) for x in (q, k, v, g))
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    p = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale
    return dq.astype(dtype), dk.astype(dtype), dv.astype(dtype)


flash_attention.defvjp(_fwd, _bwd)
