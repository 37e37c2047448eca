"""Experiment: can the VPU softmax overlap MXU work inside the flash kernel?

Round-2 state (ROADMAP #2): the single-pass forward kernel is VPU-bound —
3.24 ms at (24, 4608, 128) vs 1.32 ms MXU speed-of-light; the exp over
24x4608^2 logits is ~2 ms of VPU work serialized after the QK matmul inside
each grid step. Two candidate fixes, both measured here against the
production kernel:

1. *Unrolled chunked online softmax*: one grid step per (b, h, q-block) with
   whole K/V VMEM-resident (same as production), but the logits/softmax/PV
   work split over N statically-unrolled KV chunks with online max/sum
   rescaling. The unrolled body exposes chunk i's exp (VPU) and chunk i+1's
   QK matmul (MXU) as independent instructions the VLIW scheduler may
   overlap.
2. *bf16 exp*: compute exp on bf16 values (probs are cast to bf16 for the PV
   matmul anyway); halves the transcendental input width if the VPU packs
   bf16 lanes.

Run on the real chip: python benchmarks/exp_softmax_overlap.py
"""

from __future__ import annotations

import functools as ft
import math
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from reptext_tpu.ops.flash_attention import _flash_attention_impl  # noqa: E402

B, H, S, D = 1, 24, 4608, 128
ITERS = 20


def timeit_chained(fn):
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, H, S, D), jnp.bfloat16)

    def chained(q, k, v):
        def body(i, qq):
            o = fn(qq, k, v)
            return (qq + 1e-6 * o).astype(qq.dtype)
        out = jax.lax.fori_loop(0, ITERS, body, q)
        return jnp.sum(out.astype(jnp.float32))

    jc = jax.jit(chained)
    float(jc(q, k, v))
    t0 = time.perf_counter()
    float(jc(q, k, v))
    return (time.perf_counter() - t0) / ITERS


def check_correct(fn, atol=2e-2):
    rng = jax.random.PRNGKey(7)
    q = jax.random.normal(rng, (1, 2, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (1, 2, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (1, 2, S, D), jnp.bfloat16)
    ref = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        / math.sqrt(D), axis=-1,
    ) @ v.astype(jnp.float32)
    out = jax.jit(fn)(q, k, v).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < atol, f"max err {err}"
    return err


# --- 1. unrolled chunked online softmax -----------------------------------

def _chunked_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_chunks):
    q = q_ref[0, 0]                        # [bq, D]
    s_pad = k_ref.shape[2]
    chunk = s_pad // n_chunks

    m = None
    acc = None
    denom = None
    for ci in range(n_chunks):             # static unroll
        k = k_ref[0, 0, ci * chunk:(ci + 1) * chunk, :]
        v = v_ref[0, 0, ci * chunk:(ci + 1) * chunk, :]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                           # [bq, chunk]
        m_c = jnp.max(logits, axis=-1, keepdims=True)
        if m is None:
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
    o_ref[0, 0] = (acc / denom).astype(o_ref.dtype)


def chunked_attn(q, k, v, block_q=256, n_chunks=4):
    b, h, s, d = q.shape
    return pl.pallas_call(
        ft.partial(_chunked_kernel, scale=1.0 / math.sqrt(d), n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        grid=(b, h, s // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(q, k, v)


# --- 2. bf16 exp ------------------------------------------------------------

def _bf16exp_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    # exp computed at bf16 width; probs feed a bf16 PV matmul regardless.
    e = jnp.exp((logits - m).astype(jnp.bfloat16))
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / denom).astype(o_ref.dtype)


def bf16exp_attn(q, k, v, block_q=256):
    b, h, s, d = q.shape
    return pl.pallas_call(
        ft.partial(_bf16exp_kernel, scale=1.0 / math.sqrt(d)),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        grid=(b, h, s // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(q, k, v)


def main():
    t = timeit_chained(lambda q, k, v: _flash_attention_impl(q, k, v, 256)[0])
    print(f"production bq=256:          {t*1e3:.3f} ms", flush=True)

    for bq in (256, 512):
        for nc in (2, 4, 8):
            err = check_correct(lambda q, k, v, bq=bq, nc=nc:
                                chunked_attn(q, k, v, bq, nc))
            t = timeit_chained(lambda q, k, v, bq=bq, nc=nc:
                               chunked_attn(q, k, v, bq, nc))
            print(f"chunked bq={bq} chunks={nc}: {t*1e3:.3f} ms "
                  f"(err {err:.1e})", flush=True)

    err = check_correct(bf16exp_attn, atol=4e-2)
    t = timeit_chained(bf16exp_attn)
    print(f"bf16-exp bq=256:            {t*1e3:.3f} ms (err {err:.1e})",
          flush=True)

    flops = 2 * 2 * B * H * S * S * D
    print(f"MXU speed-of-light (197 TF/s): {flops/197e12*1e3:.3f} ms")


if __name__ == "__main__":
    main()
