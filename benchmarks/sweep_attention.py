"""Flash-attention kernel tuning sweep at FLUX-native shape (24, 4608, 128).

Times the Pallas forward kernel across block_q with the tunnel-proof chained
protocol (bench.py::timeit semantics) and compares against the XLA einsum
path and the MXU speed-of-light. Run on the real chip:

    python benchmarks/sweep_attention.py
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from reptext_tpu.ops.flash_attention import _flash_attention_impl  # noqa: E402

B, H, S, D = 1, 24, 4608, 128
ITERS = 20


def timeit_chained(fn):
    """Chained in-graph iterations + scalar fetch (honest vs the tunnel)."""
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, H, S, D), jnp.bfloat16)

    def chained(q, k, v):
        def body(i, qq):
            o = fn(qq, k, v)
            return (qq + 1e-6 * o).astype(qq.dtype)  # data dependence
        out = jax.lax.fori_loop(0, ITERS, body, q)
        return jnp.sum(out.astype(jnp.float32))

    jc = jax.jit(chained)
    float(jc(q, k, v))  # compile + run
    t0 = time.perf_counter()
    float(jc(q, k, v))
    return (time.perf_counter() - t0) / ITERS


def main():
    results = {}
    # block_q=1024 exceeds scoped VMEM (logits+e fp32 tiles alongside whole
    # K/V: ~21MB > 16MB) — measured OOM at compile, not listed.
    for block_q in (128, 256, 512):
        t = timeit_chained(
            lambda q, k, v, bq=block_q: _flash_attention_impl(q, k, v, bq)[0]
        )
        results[f"pallas bq={block_q}"] = t
        print(f"pallas block_q={block_q}: {t*1e3:.3f} ms", flush=True)

    # exp2 variant: TPU's native transcendental is exp2; fold ln2 into the
    # scale so the softmax pass uses exp2 directly.
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _exp2_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
        q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * 1.4426950408889634)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp2(logits - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = (o / denom).astype(o_ref.dtype)

    def exp2_attn(q, k, v, block_q=256):
        b, h, s, d = q.shape
        return pl.pallas_call(
            ft.partial(_exp2_kernel, scale=1.0 / math.sqrt(d)),
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

    t = timeit_chained(exp2_attn)
    results["pallas exp2 bq=256"] = t
    print(f"pallas exp2 bq=256: {t*1e3:.3f} ms", flush=True)

    def xla(q, k, v):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits / math.sqrt(D), axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

    t = timeit_chained(xla)
    results["xla einsum"] = t
    print(f"xla einsum: {t*1e3:.3f} ms", flush=True)

    flops = 2 * 2 * B * H * S * S * D
    best = min(v for k_, v in results.items() if k_.startswith("pallas"))
    print(f"\nMXU speed-of-light (197 TF/s): {flops/197e12*1e3:.3f} ms")
    print(f"best pallas MFU: {flops/best/197e12*100:.1f}%")


if __name__ == "__main__":
    main()
