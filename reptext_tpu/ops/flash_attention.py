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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --- clamped max-free softmax (round-5 third pass on the VPU floor) --------
#
# The classical online softmax exists to keep exp() in range for ARBITRARY
# logits. FLUX applies RMSNorm to q and k per head (QK-norm), which bounds
# |logit| <= sqrt(d)*|g_q|*|g_k| ~ 11.3*|g|^2 — and a two-sided clamp at
# +/-_LOGIT_CLAMP makes exp safe for ANY input: exp(+/-43) spans
# [2.1e-19, 4.7e18], so even a 1e5-key row sums to < 4.7e23 (fp32 max
# 3.4e38) and a full row at the lower clamp still sums to S*2.1e-19 >> 0
# (fp32 min normal 1.2e-38) — overflow and 0/0 are both impossible without
# tracking a running max. Dropping the max buys, per K/V chunk: no
# max-reduce pass, no (logits - m) subtract (exp(logits) directly), no
# cross-chunk alpha rescale of the accumulator — and makes the chunks
# DATA-INDEPENDENT, so the VLIW scheduler can overlap chunk i's exp (VPU)
# with chunk i+1's QK matmul (MXU) without the serialized max/rescale
# chain. The clamp only engages at |logit| > 43, i.e. QK-norm gain products
# >= 3.8 — far outside trained-model range; if it DOES engage, the softmax
# saturates toward the clamped entries' uniform mix (documented deviation,
# tests/test_attention.py pins both sides of the bound). The lse output
# stays exact: log(sum exp(logits)) with no max offset.
#
# REPTEXT_SOFTMAX=online restores the running-max kernels (A/B lever;
# numerics at trained-model scales are identical to ~1e-6).
_LOGIT_CLAMP = 43.0


def _softmax_mode() -> str:
    mode = os.environ.get("REPTEXT_SOFTMAX", "clamped")
    if mode not in ("clamped", "online"):
        raise ValueError(f"REPTEXT_SOFTMAX must be clamped|online, got {mode}")
    return mode


# Above this joint length the single-pass kernel's [block_q, S] logits tile
# no longer fits VMEM alongside whole K/V; switch to the streaming kernel.
_SINGLE_PASS_MAX_SEQ = 6144


def _pick_chunks(s_pad: int, block_q: int):
    """Chunk count + query block for the single-pass kernels.

    Chunks must be 128-lane aligned; prefer 3 (the VPU/MXU-overlap sweet spot
    measured at 4608), else 4, else 2 (e.g. the inpaint op-point's 5632-pad
    sequence, where s_pad % 384 != 0). The [block_q, chunk] fp32 logits tile
    is then capped at ~4.5MB of scoped VMEM — at 5632 keys a single-chunk
    [512, 5632] tile is 11.5MB and overflows the 16MB scoped-vmem limit
    (measured: 16.75M > 16M at the 1280x960 dual-CN step)."""
    n_chunks = 1
    for cand in (3, 4, 2):
        if s_pad % (cand * 128) == 0 and s_pad // cand >= 384:
            n_chunks = cand
            break
    while block_q > 256 and block_q * (s_pad // n_chunks) * 4 > 4.5 * 2 ** 20:
        block_q //= 2
    return n_chunks, block_q


def _softmax_chunk_loop(q, k_ref, v_ref, n_chunks: int, valid_len: int,
                        max_free: bool, rotate_k=None):
    """Shared chunked softmax body for the single-pass kernels.

    Returns (acc, denom, lse_offset): attention output = acc / denom,
    logsumexp = lse_offset + log(denom). ``rotate_k`` (RoPE variant) maps a
    raw K chunk slice + chunk index to the rotated K tile.

    max_free=True (default): clamped max-free softmax — e = exp(clip(logits))
    with no running max; every chunk is independent (see _LOGIT_CLAMP note).
    max_free=False: classical online softmax with the running-max/alpha
    rescale chain (REPTEXT_SOFTMAX=online).
    """
    s_pad = k_ref.shape[2]
    chunk = s_pad // n_chunks
    m = acc = denom = None
    for ci in range(n_chunks):  # static unroll (VPU/MXU overlap)
        k_raw = k_ref[0, 0, ci * chunk:(ci + 1) * chunk, :]
        k = rotate_k(k_raw, ci, chunk) if rotate_k is not None else k_raw
        v = v_ref[0, 0, ci * chunk:(ci + 1) * chunk, :]
        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, chunk]
        if max_free:
            logits = jnp.clip(logits, -_LOGIT_CLAMP, _LOGIT_CLAMP)
        if valid_len < (ci + 1) * chunk:
            # padding mask AFTER the clip: exp(-inf) == 0 exactly
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < valid_len - ci * chunk, logits, -jnp.inf)

        if max_free:
            e = jnp.exp(logits)
            pv = jax.lax.dot_general(
                e.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if denom is None:
                denom = jnp.sum(e, axis=-1, keepdims=True)
                acc = pv
            else:
                denom = denom + jnp.sum(e, axis=-1, keepdims=True)
                acc = acc + pv
            continue

        m_c = jnp.max(logits, axis=-1, keepdims=True)
        if m is None:
            # First chunk always holds >=1 valid key (valid_len >= 1), so
            # m is finite from here on and exp(-inf - m) == 0 for padding.
            m_new = m_c
            e = jnp.exp(logits - m_new)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                e.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m_new = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_new)
            e = jnp.exp(logits - m_new)
            denom = denom * alpha + jnp.sum(e, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                e.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m = m_new
    return acc, denom, (jnp.float32(0.0) if max_free else m)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, valid_len: int,
                 scale: float, n_chunks: int, max_free: bool):
    """Single grid step per (b, h, q-block); whole K/V VMEM-resident.

    The softmax scale is folded into q up front (one [block_q, D] multiply
    instead of a [block_q, S] pass: 36x fewer VPU ops at S=4608, D=128), and
    the K/V extent is processed as ``n_chunks`` statically-unrolled chunks.
    The unrolled body exposes chunk i's exp (VPU) and chunk i+1's QK matmul
    (MXU) as independent instructions the VLIW scheduler can overlap —
    measured 3.24 -> 2.86 ms at (24, 4608, 128) with the online-softmax
    body, where the single-chunk kernel is VPU-bound
    (benchmarks/exp_softmax_overlap.py); the max-free body removes the
    remaining cross-chunk serialization (see _LOGIT_CLAMP).
    """
    q = (q_ref[0, 0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    acc, denom, m = _softmax_chunk_loop(
        q, k_ref, v_ref, n_chunks, valid_len, max_free)
    # Normalize AFTER the PV matmul: dividing the [block_q, D] output costs
    # block_q*D VPU divides instead of a block_q*S_pad full-width pass.
    o_ref[0, 0] = (acc / denom).astype(o_ref.dtype)
    # logsumexp per query row: the softmax statistic the backward pass needs
    # to recompute p = exp(logits - L) without a second max/sum reduction.
    l_ref[0, 0] = m + jnp.log(denom)


def _attn_kernel_rope(q_ref, k_ref, v_ref, qcos_ref, qsin_ref, kcos_ref,
                      ksin_ref, o_ref, l_ref, *, valid_len: int, scale: float,
                      n_chunks: int, max_free: bool):
    """Chunked softmax kernel with RoPE fused (half-split layout).

    q/k arrive UNROTATED in half-split channel order; rotation happens on the
    VMEM-resident tiles — the rotated tensors never round-trip HBM, which is
    where the XLA apply_rope cost lives (measured 4.15 -> 2.88 ms at
    (24, 4608, 128) including rotation, benchmarks/exp_softmax_overlap.py
    lineage). Tables are bf16 ([-1,1] values: representation error matches
    the bf16 q/k storage error). Rotate-half is a contiguous half swap; the
    k rotation repeats per q-block but is negligible VPU work (S*D vs the
    bq*S softmax).
    """
    d = q_ref.shape[-1]
    d2 = d // 2
    q0 = q_ref[0, 0].astype(jnp.float32)
    qrot = jnp.concatenate([-q0[:, d2:], q0[:, :d2]], axis=-1)
    q = ((q0 * qcos_ref[...] + qrot * qsin_ref[...]) * scale).astype(q_ref.dtype)

    def rotate_k(k_raw, ci, chunk):
        k0 = k_raw.astype(jnp.float32)
        cc = kcos_ref[ci * chunk:(ci + 1) * chunk, :]
        sc = ksin_ref[ci * chunk:(ci + 1) * chunk, :]
        krot = jnp.concatenate([-k0[:, d2:], k0[:, :d2]], axis=-1)
        return (k0 * cc + krot * sc).astype(k_raw.dtype)

    acc, denom, m = _softmax_chunk_loop(
        q, k_ref, v_ref, n_chunks, valid_len, max_free, rotate_k=rotate_k)
    o_ref[0, 0] = (acc / denom).astype(o_ref.dtype)
    l_ref[0, 0] = m + jnp.log(denom)


def _streaming_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, m_scr, l_scr, acc_scr,
                      *, valid_len: int, scale: float, block_kv: int,
                      max_free: bool):
    """Flash attention with kv chunks streaming through VMEM.

    Grid (B, H, q_blocks, kv_blocks) with kv innermost; scratch (running max
    in online mode, normalizer, fp32 accumulator) persists across the kv
    dimension. max_free drops the running-max/alpha chain (see _LOGIT_CLAMP);
    the per-block rescale of the [block_q, D] accumulator disappears.
    """
    kv_idx = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _():
        if not max_free:
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

    if max_free:
        logits = jnp.clip(logits, -_LOGIT_CLAMP, _LOGIT_CLAMP)
    first_invalid = valid_len - kv_idx * block_kv
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < first_invalid, logits, -jnp.inf)

    if max_free:
        p = jnp.exp(logits)
        l_scr[:] = l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
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
        m_fin = jnp.float32(0.0) if max_free else m_scr[:]
        o_ref[0, 0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)
        l_ref[0, 0] = m_fin + jnp.log(l_scr[:])


def _streaming_flash(q, k, v, block_q, block_kv, interpret):
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    s_pad = _round_up(_round_up(s, block_q), block_kv)
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    grid = (b, h, s_pad // block_q, s_pad // block_kv)
    kernel = functools.partial(
        _streaming_kernel, valid_len=s, scale=scale, block_kv=block_kv,
        max_free=_softmax_mode() == "clamped",
    )
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :s, :], lse[:, :, :s, 0]


def _flash_attention_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 768,
    interpret: bool = False,
) -> jax.Array:
    """Full (non-causal) MHA: [B, H, S, D] x3 -> ([B, H, S, D], lse [B, H, S]).

    Single-pass kernel (whole K/V VMEM-resident) at FLUX-native lengths;
    streaming online-softmax kernel beyond ~6k tokens (>=1536^2 images).
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    The second output is the per-row logsumexp, consumed by the Pallas
    backward to recompute softmax probabilities blockwise.
    """
    b, h, s, d = q.shape
    if s > _SINGLE_PASS_MAX_SEQ:
        return _streaming_flash(q, k, v, min(block_q, 256), 512, interpret)
    scale = 1.0 / math.sqrt(d)

    s_pad = _round_up(s, 128)
    if s_pad > 4608:
        # [block_q, chunk] fp32 logits tiles at block_q=768 exceed scoped
        # VMEM past 4608 keys (measured OOM at 20.1M); shrink query blocks.
        block_q = min(block_q, 512)
    block_q = min(block_q, s_pad)
    s_pad = _round_up(s_pad, block_q)
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    # Chunking below ~1152 keys has nothing to overlap (the whole softmax
    # fits one VPU burst); _pick_chunks also bounds the fp32 logits tile.
    n_chunks, block_q = _pick_chunks(s_pad, block_q)
    grid = (b, h, s_pad // block_q)
    kernel = functools.partial(
        _attn_kernel, valid_len=s, scale=scale, n_chunks=n_chunks,
        max_free=_softmax_mode() == "clamped",
    )

    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, 1), jnp.float32),
        ),
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
        out_specs=(
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * s_pad * s_pad * d,
            bytes_accessed=(3 * b * h * s_pad * d + b * h * s_pad * d) * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v)

    return out[:, :, :s, :], lse[:, :, :s, 0]


def _flash_attention_rope_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rope_cos: jax.Array,
    rope_sin: jax.Array,
    block_q: int = 512,
    interpret: bool = False,
):
    """Flash attention with RoPE (half-split) fused into the kernel.

    q/k are UNROTATED, in half-split channel order (io/convert.py folds the
    deinterleave permutation into checkpoint q/k weights). Falls back to an
    XLA pre-rotation + the plain kernel when the single-pass kernel does not
    apply (long sequences -> streaming) or chunking is unavailable.
    block_q defaults to 512: the rope tables take VMEM that the 768 default
    of the plain kernel would overflow (measured 23.5M > 16M).
    """
    from reptext_tpu.ops.rope import apply_rope_half

    b, h, s, d = q.shape
    s_pad = _round_up(s, 128)
    if s_pad > 4608:
        # the K-side rope tables (cos+sin, [s_pad, d] each) cost ~3MB of the
        # 16MB scoped VMEM at 5632 keys; halving the q block buys the logits
        # tile back (measured 16.004M > 16M at block_q=512, s_pad=5632)
        block_q = min(block_q, 256)
    block_q = min(block_q, s_pad)
    s_pad_final = _round_up(s_pad, block_q)
    n_chunks, block_q = _pick_chunks(s_pad_final, block_q)
    if s > _SINGLE_PASS_MAX_SEQ or n_chunks == 1:
        # streaming or tiny path: rotate in XLA. In-kernel rotation was
        # MEASURED SLOWER for the streaming schedule (25.4 vs 22.9 ms at
        # 24x9728x128): K rotates redundantly once per q-block (38x there,
        # vs 6x in the single-pass kernel where it pays off).
        q_rot = apply_rope_half(q, rope_cos, rope_sin)
        k_rot = apply_rope_half(k, rope_cos, rope_sin)
        return _flash_attention_impl(q_rot, k_rot, v, block_q, interpret)
    s_pad = s_pad_final

    scale = 1.0 / math.sqrt(d)
    cos_b = rope_cos.astype(jnp.bfloat16)
    sin_b = rope_sin.astype(jnp.bfloat16)
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        pad2 = [(0, s_pad - s), (0, 0)]
        cos_b, sin_b = jnp.pad(cos_b, pad2), jnp.pad(sin_b, pad2)

    grid = (b, h, s_pad // block_q)
    kernel = functools.partial(
        _attn_kernel_rope, valid_len=s, scale=scale, n_chunks=n_chunks,
        max_free=_softmax_mode() == "clamped",
    )
    row4 = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                        memory_space=pltpu.VMEM)
    full4 = pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    qtbl = pl.BlockSpec((block_q, d), lambda bi, hi, qi: (qi, 0),
                        memory_space=pltpu.VMEM)
    ktbl = pl.BlockSpec((s_pad, d), lambda bi, hi, qi: (0, 0),
                        memory_space=pltpu.VMEM)

    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[row4, full4, full4, qtbl, qtbl, ktbl, ktbl],
        out_specs=(
            row4,
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * s_pad * s_pad * d,
            bytes_accessed=4 * b * h * s_pad * d * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v, cos_b, sin_b, cos_b, sin_b)
    return out[:, :, :s, :], lse[:, :, :s, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention_rope(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rope_cos: jax.Array,
    rope_sin: jax.Array,
    block_q: int = 512,
    interpret: bool = False,
    backward: str = "pallas",
) -> jax.Array:
    """RoPE-fused flash attention; q/k unrotated, half-split channel order.

    Gradients flow to q/k/v; the cos/sin tables are positional constants
    (built from integer ids) and receive zero gradients.
    """
    out, _ = _flash_attention_rope_impl(q, k, v, rope_cos, rope_sin,
                                        block_q, interpret)
    return out


def _rope_fwd(q, k, v, rope_cos, rope_sin, block_q, interpret, backward):
    out, lse = _flash_attention_rope_impl(q, k, v, rope_cos, rope_sin,
                                          block_q, interpret)
    return out, (q, k, v, rope_cos, rope_sin, out, lse)


def _rope_bwd(block_q, interpret, backward, residuals, g):
    from reptext_tpu.ops.rope import apply_rope_half

    q, k, v, rope_cos, rope_sin, out, lse = residuals
    # The rotation R is linear and orthogonal per 2-channel pair; with the
    # table halves equal (rope_cos_sin_half), R^T == rotation by -theta, so
    # dq = R^T(dq_rot) = apply_rope_half(dq_rot, cos, -sin).
    q_rot = apply_rope_half(q, rope_cos, rope_sin)
    k_rot = apply_rope_half(k, rope_cos, rope_sin)
    if backward == "einsum":
        dq_rot, dk_rot, dv = _flash_backward_einsum(q_rot, k_rot, v, g)
    else:
        dq_rot, dk_rot, dv = _flash_backward_pallas(
            q_rot, k_rot, v, out, lse, g, block_q, interpret
        )
    dq = apply_rope_half(dq_rot, rope_cos, -rope_sin)
    dk = apply_rope_half(dk_rot, rope_cos, -rope_sin)
    return dq, dk, dv, jnp.zeros_like(rope_cos), jnp.zeros_like(rope_sin)


flash_attention_rope.defvjp(_rope_fwd, _rope_bwd)


# ---------------------------------------------------------------------------
# Backward pass: streaming Pallas kernels (flash-attention backward).
#
# Training (flow-matching fine-tune / ControlNet training,
# RepText/controlnet_flux.py:321-340 gradient-checkpoint affordance)
# differentiates through attention. The backward recomputes softmax
# probabilities blockwise from the saved logsumexp rows — O(block_q x
# block_kv) VMEM, never O(S^2) HBM — in two kernels: dQ (kv innermost) and
# dK/dV (q innermost). An fp32 einsum backward is kept as the numerical
# reference ('einsum' impl, also the CPU-test oracle).
# ---------------------------------------------------------------------------


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc,
               *, valid_len: int, scale: float, block_kv: int, max_free: bool):
    kv_idx = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [block_q, block_kv]
    if max_free:
        # mirror the forward's clamp so p matches the forward EXACTLY in the
        # unclamped region (everywhere, for QK-normed models). For a logit
        # that DID clamp, ds is the straight-through estimate (clip treated
        # as identity) — acceptable for a region trained models never enter.
        logits = jnp.clip(logits, -_LOGIT_CLAMP, _LOGIT_CLAMP)
    first_invalid = valid_len - kv_idx * block_kv
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < first_invalid, logits, -jnp.inf)

    p = jnp.exp(logits - lse_ref[0, 0])  # masked cols -> exp(-inf)=0
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0])
    acc[:] += jax.lax.dot_general(
        ds, k.astype(jnp.float32), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(kv_idx == n_kv - 1)
    def _():
        dq_ref[0, 0] = acc[:].astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc,
                *, valid_len: int, scale: float, block_kv: int,
                max_free: bool):
    q_idx = pl.program_id(3)
    n_q = pl.num_programs(3)
    kv_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0, 0]
    v = v_ref[0, 0]
    q = q_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [block_q, block_kv]
    if max_free:
        logits = jnp.clip(logits, -_LOGIT_CLAMP, _LOGIT_CLAMP)  # see _dq_kernel
    first_invalid = valid_len - kv_idx * block_kv
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < first_invalid, logits, -jnp.inf)

    p = jnp.exp(logits - lse_ref[0, 0])
    dv_acc[:] += jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # p^T @ do -> [block_kv, D]
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0])
    dk_acc[:] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # ds^T @ q -> [block_kv, D]

    @pl.when(q_idx == n_q - 1)
    def _():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward_pallas(q, k, v, out, lse, g, block_q, interpret):
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    block_kv = min(block_q, 512)
    s_pad = _round_up(_round_up(max(s, 128), block_q), block_kv)
    block_q = min(block_q, s_pad)
    if s_pad != s:
        pad4 = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        pad3 = [(0, 0), (0, 0), (0, s_pad - s)]
        q, k, v, g = (jnp.pad(x, pad4) for x in (q, k, v, g))
        out = jnp.pad(out, pad4)
        lse = jnp.pad(lse, pad3)
    lse = lse[..., None]  # [B, H, S_pad, 1] (trailing dim for TPU tiling)

    # delta_i = sum_d dO_i * O_i  (rowwise; cheap XLA elementwise reduce)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
                    keepdims=True)

    row4 = lambda blk: pl.BlockSpec(  # noqa: E731
        (1, 1, blk, d), lambda bi, hi, i, j: (bi, hi, i, 0),
        memory_space=pltpu.VMEM)
    inner4 = lambda blk: pl.BlockSpec(  # noqa: E731
        (1, 1, blk, d), lambda bi, hi, i, j: (bi, hi, j, 0),
        memory_space=pltpu.VMEM)
    row3 = lambda blk: pl.BlockSpec(  # noqa: E731
        (1, 1, blk, 1), lambda bi, hi, i, j: (bi, hi, i, 0), memory_space=pltpu.VMEM)
    inner3 = lambda blk: pl.BlockSpec(  # noqa: E731
        (1, 1, blk, 1), lambda bi, hi, i, j: (bi, hi, j, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, valid_len=s, scale=scale,
                          block_kv=block_kv,
                          max_free=_softmax_mode() == "clamped"),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        grid=(b, h, s_pad // block_q, s_pad // block_kv),
        in_specs=[row4(block_q), inner4(block_kv), inner4(block_kv),
                  row4(block_q), row3(block_q), row3(block_q)],
        out_specs=row4(block_q),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * b * h * s_pad * s_pad * d,
            bytes_accessed=6 * b * h * s_pad * d * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(q, k, v, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, valid_len=s, scale=scale,
                          block_kv=block_kv,
                          max_free=_softmax_mode() == "clamped"),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, d), v.dtype),
        ),
        grid=(b, h, s_pad // block_kv, s_pad // block_q),
        in_specs=[row4(block_kv), row4(block_kv), inner4(block_q),
                  inner4(block_q), inner3(block_q), inner3(block_q)],
        out_specs=(row4(block_kv), row4(block_kv)),
        scratch_shapes=[pltpu.VMEM((block_kv, d), jnp.float32),
                        pltpu.VMEM((block_kv, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * b * h * s_pad * s_pad * d,
            bytes_accessed=6 * b * h * s_pad * d * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(k, v, q, g, lse, delta)

    return dq[:, :, :s], dk[:, :, :s], dv[:, :, :s]


def _flash_backward_einsum(q, k, v, g):
    """Reference O(S^2)-memory fp32 backward (numerical oracle for tests)."""
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 256,
    interpret: bool = False,
    backward: str = "pallas",
) -> jax.Array:
    out, _ = _flash_attention_impl(q, k, v, block_q, interpret)
    return out


def _fwd(q, k, v, block_q, interpret, backward):
    out, lse = _flash_attention_impl(q, k, v, block_q, interpret)
    return out, (q, k, v, out, lse)


def _bwd(block_q, interpret, backward, residuals, g):
    q, k, v, out, lse = residuals
    if backward == "einsum":
        return _flash_backward_einsum(q, k, v, g)
    return _flash_backward_pallas(q, k, v, out, lse, g, block_q, interpret)


flash_attention.defvjp(_fwd, _bwd)
