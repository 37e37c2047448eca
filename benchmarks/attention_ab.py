"""A/B benchmark: Pallas flash attention vs XLA einsum attention, model-level.

Per-op microbenchmarks through the remote-TPU execution tunnel are dominated
by dispatch artifacts, so this compares backends inside the real workload: a
full-width FLUX forward step (depth 2+4, bf16) where each timing iteration is
ONE device dispatch. Informs the 'auto' backend choice in
reptext_tpu.ops.attention.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def build(backend: str, lat: int):
    from reptext_tpu.configs import FluxConfig
    from reptext_tpu.models import FluxTransformer2D
    from reptext_tpu.ops.latents import prepare_latent_image_ids

    cfg = dataclasses.replace(FluxConfig(), num_layers=2, num_single_layers=4)
    model = FluxTransformer2D(
        cfg, attention_backend=backend, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
    )
    b, s_txt = 1, 512
    s_img = (lat // 2) ** 2
    rng = jax.random.PRNGKey(0)
    hidden = jax.random.normal(rng, (b, s_img, 64), jnp.bfloat16)
    ctx = jax.random.normal(rng, (b, s_txt, 4096), jnp.bfloat16)
    pooled = jax.random.normal(rng, (b, 768), jnp.bfloat16)
    t = jnp.full((b,), 0.5, jnp.bfloat16)
    img_ids = prepare_latent_image_ids(lat, lat)
    txt_ids = jnp.zeros((s_txt, 3))
    guidance = jnp.full((b,), 3.5, jnp.bfloat16)
    params = jax.jit(model.init)(rng, hidden, ctx, pooled, t, img_ids, txt_ids, guidance)

    def fn(p, h):
        return model.apply(p, h, ctx, pooled, t, img_ids, txt_ids, guidance)

    return fn, params, hidden


def timeit(fn, params, hidden, iters=10):
    """In-graph chained timing + scalar fetch (the execution tunnel acks
    un-fetched dispatches early; see bench.py timeit)."""
    def chained(p, h):
        out = jax.lax.fori_loop(0, iters, lambda i, hh: fn(p, hh).astype(h.dtype), h)
        return jnp.sum(out.astype(jnp.float32))
    jc = jax.jit(chained)
    float(jc(params, hidden))  # compile
    t0 = time.perf_counter()
    float(jc(params, hidden))
    return (time.perf_counter() - t0) / iters


def build_grad(backend: str, lat: int):
    """Training-path variant: value+grad of an MSE loss wrt params — times the
    attention BACKWARD (Pallas blockwise dQ/dKV kernels vs the einsum VJP)
    inside the real block stack."""
    fn, params, hidden = build(backend, lat)

    def loss(p, h):
        out = fn(p, h)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    def gstep(p, h):
        l, g = jax.value_and_grad(loss)(p, h)
        # fold the grads into a scalar so the chained-timing wrapper can
        # carry a fixed-shape value and the tunnel fetch stays one scalar
        return l + sum(
            jnp.sum(x.astype(jnp.float32) ** 2)
            for x in jax.tree_util.tree_leaves(g)
        ) * 0.0

    def as_hidden(p, h):  # match timeit's fn(p, h) -> like-h contract
        return h + gstep(p, h).astype(h.dtype)

    return as_hidden, params, hidden


def main():
    import gc

    grad_mode = "--grad" in sys.argv
    builder = build_grad if grad_mode else build
    print(f"backend={jax.default_backend()} device={jax.devices()[0]} "
          f"mode={'grad' if grad_mode else 'fwd'}")
    sizes = (64, 128) if grad_mode else (64, 128, 192, 256)
    for lat in sizes:  # 512^2, 1024^2, 1536^2, 2048^2 images
        row = {}
        # at 2048^2 (16896 joint tokens) the XLA einsum path needs a 27GB
        # fp32 logits tensor — only the streaming Pallas kernel can run
        backends = ("pallas",) if lat >= 256 else ("xla", "pallas")
        for backend in backends:
            fn, params, hidden = builder(backend, lat)
            try:
                row[backend] = timeit(fn, params, hidden)
            except Exception as e:  # noqa: BLE001 — e.g. einsum-bwd residual OOM
                print(f"joint_seq={512 + (lat // 2) ** 2}: {backend} "
                      f"FAILED ({type(e).__name__})", flush=True)
            del fn, params, hidden
            gc.collect()
        s = 512 + (lat // 2) ** 2
        if "pallas" not in row:
            continue
        if "xla" in row:
            print(
                f"joint_seq={s:5d}: xla {row['xla']*1e3:7.2f}ms  "
                f"pallas {row['pallas']*1e3:7.2f}ms  "
                f"speedup {row['xla']/row['pallas']:.3f}x",
                flush=True,
            )
        else:
            print(
                f"joint_seq={s:5d}: pallas {row['pallas']*1e3:7.2f}ms  "
                f"(xla einsum infeasible: O(S^2) fp32 logits)",
                flush=True,
            )


if __name__ == "__main__":
    main()
