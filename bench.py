"""Benchmark: RepText 1024^2 FLUX sampling throughput on the local TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Method: runs the REAL fused sampling step (base FLUX fwd + ControlNet fwd with
regional masking + Euler update, all one XLA graph) at 1024^2 / bf16 / full
3072 width / 24 heads, but with reduced transformer depth so weights fit one
16GB v5e chip (full FLUX.1-dev is 12B params = 24GB bf16 and is a multi-chip
model here; see parallel/). Per-step cost is then scaled to full depth by the
measured per-block costs — transformer cost is linear in depth, so this is a
FLOP-exact extrapolation, reported alongside the raw measurement.

Baseline: A100-80GB torch/diffusers FLUX.1-dev+RepText at 1024^2/28-step runs
~2.4 images/min (no published number exists in the reference repo —
BASELINE.md; figure from public FLUX benchmarks). vs_baseline = value / 2.4.
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

STEPS = 28
A100_IMAGES_PER_MIN = 2.4  # public A100 FLUX.1-dev 1024^2 reference point

# measured depths (fit on one chip alongside activations)
MEAS_DOUBLE, MEAS_SINGLE = 2, 4
FULL_DOUBLE, FULL_SINGLE = 19, 38
CN_DOUBLE, CN_SINGLE = 4, 10          # RepText ControlNet depth
CN_GATE_FRAC = 25 / 28                # ControlNet active for first 25/28 steps


def build_step(num_double: int, num_single: int, with_cn: bool):
    from reptext_tpu.configs import ControlNetConfig, FluxConfig
    from reptext_tpu.models import FluxTransformer2D, RepTextControlNet
    from reptext_tpu.ops.latents import prepare_latent_image_ids

    flux_cfg = dataclasses.replace(
        FluxConfig(), num_layers=num_double, num_single_layers=num_single
    )
    model = FluxTransformer2D(flux_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)

    b, s_txt = 1, 512
    lat = 1024 // 8
    s_img = (lat // 2) * (lat // 2)  # 4096
    rng = jax.random.PRNGKey(0)
    hidden = jax.random.normal(rng, (b, s_img, 64), jnp.bfloat16)
    ctx = jax.random.normal(rng, (b, s_txt, 4096), jnp.bfloat16)
    pooled = jax.random.normal(rng, (b, 768), jnp.bfloat16)
    t = jnp.full((b,), 0.5, jnp.bfloat16)
    img_ids = prepare_latent_image_ids(lat, lat)
    txt_ids = jnp.zeros((s_txt, 3))
    guidance = jnp.full((b,), 3.5, jnp.bfloat16)
    params = jax.jit(model.init)(rng, hidden, ctx, pooled, t, img_ids, txt_ids, guidance)

    # params MUST be threaded as arguments all the way into the timing jit:
    # closure capture bakes them into the program as constants (gigabytes
    # shipped to the compiler).
    if not with_cn:
        def fn(p, h):
            return model.apply(p, h, ctx, pooled, t, img_ids, txt_ids, guidance)
        return fn, params, hidden

    cn_cfg = dataclasses.replace(
        ControlNetConfig(), num_layers=CN_DOUBLE, num_single_layers=CN_SINGLE
    )
    cn = RepTextControlNet(cn_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    cond = jax.random.normal(rng, (b, s_img, 128), jnp.bfloat16)
    cn_params = jax.jit(cn.init)(
        rng, hidden, cond, ctx, pooled, t, img_ids, txt_ids, guidance
    )

    def fn(p, h):
        block, single = cn.apply(
            p["cn"], h, cond, ctx, pooled, t, img_ids, txt_ids, guidance
        )
        return model.apply(
            p["base"], h, ctx, pooled, t, img_ids, txt_ids, guidance,
            controlnet_block_samples=block, controlnet_single_block_samples=single,
        )
    return fn, {"base": params, "cn": cn_params}, hidden


def build_vae_decode():
    """Full FLUX VAE decoder at 1024^2 (runs once per image)."""
    from reptext_tpu.configs import VAEConfig
    from reptext_tpu.nn.vae import AutoencoderKL

    cfg = VAEConfig()
    vae = AutoencoderKL(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (1, 128, 128, cfg.latent_channels), jnp.bfloat16)
    params = jax.jit(vae.init)(rng, z[:, :16, :16, :])  # init shape-agnostic (conv)

    def fn(p, z):
        return vae.apply(p, z, method="decode")

    return fn, params, z


def timeit(fn, params, x, iters=10, chain=True):
    """Time ``fn(params, x)`` with an in-graph data-dependent chain + scalar fetch.

    The remote-TPU execution tunnel acks dispatches (and block_until_ready)
    before real completion and content-caches identical requests, so honest
    timing requires (a) each iteration's input to depend on the previous
    output, inside ONE compiled program, and (b) fetching a scalar reduction
    to force execution. ``chain=False`` falls back to repeated dispatch for
    outputs whose shape differs from the input.
    """
    if chain:
        def chained(p, h):
            def body(i, hh):
                return fn(p, hh).astype(h.dtype)
            out = jax.lax.fori_loop(0, iters, body, h)
            return jnp.sum(out.astype(jnp.float32))
        jc = jax.jit(chained)
        float(jc(params, x))  # compile + first run
        start = time.perf_counter()
        float(jc(params, x))
        return (time.perf_counter() - start) / iters

    jfn = jax.jit(fn)
    out = jfn(params, x)
    float(jnp.sum(out.astype(jnp.float32)))
    start = time.perf_counter()
    for _ in range(iters):
        out = jfn(params, x)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - start) / iters


def main(verbose: bool = False):
    import sys

    def log(msg):
        if verbose:
            print(msg, file=sys.stderr, flush=True)

    import gc

    def measure(label, builder):
        """Build, time, then drop the model so HBM is freed between phases."""
        log(f"building {label}...")
        fn, params, x = builder()
        log(f"timing {label}...")
        t = timeit(fn, params, x)
        log(f"{label} step: {t*1e3:.1f}ms")
        del fn, params, x
        gc.collect()
        return t

    # measure base-only at two depths to get per-block costs + fixed overhead
    t_a = measure("depth A", lambda: build_step(MEAS_DOUBLE, MEAS_SINGLE, False))
    t_b = measure("depth B", lambda: build_step(2 * MEAS_DOUBLE, 2 * MEAS_SINGLE, False))
    # t(depth) = overhead + depth_scale * k ; doubling depth doubles block time
    block_time = t_b - t_a                     # cost of (MEAS_DOUBLE, MEAS_SINGLE) blocks
    overhead = max(t_a - block_time, 0.0)

    # measured ControlNet marginal cost at its real depth
    t_cn_step = measure("CN variant", lambda: build_step(MEAS_DOUBLE, MEAS_SINGLE, True))
    cn_cost = max(t_cn_step - t_a, 0.0)

    # VAE decode: once per image (output shape != input: unchained timing)
    log("building VAE decode...")
    fn_v, p_v, z = build_vae_decode()
    t_vae = timeit(fn_v, p_v, z, iters=5, chain=False)
    log(f"VAE decode: {t_vae*1e3:.1f}ms")
    del fn_v, p_v, z
    gc.collect()

    # extrapolate base transformer to full depth (linear in depth, exact for
    # homogeneous blocks)
    scale = (FULL_DOUBLE + FULL_SINGLE / 2) / (MEAS_DOUBLE + MEAS_SINGLE / 2)
    t_full_base = overhead + block_time * scale
    t_full_step_gated = t_full_base + cn_cost       # while ControlNet active
    t_image = STEPS * t_full_base + STEPS * CN_GATE_FRAC * cn_cost + t_vae

    images_per_min = 60.0 / t_image
    result = {
        "metric": "1024^2 28-step FLUX+RepText images/min/chip (depth-extrapolated)",
        "value": round(images_per_min, 4),
        "unit": "images/min/chip",
        "vs_baseline": round(images_per_min / A100_IMAGES_PER_MIN, 4),
        "measured_step_ms_depth_2_4": round(t_a * 1e3, 2),
        "measured_step_ms_depth_4_8": round(t_b * 1e3, 2),
        "controlnet_marginal_ms": round(cn_cost * 1e3, 2),
        "vae_decode_ms": round(t_vae * 1e3, 2),
        "extrapolated_full_step_ms": round(t_full_step_gated * 1e3, 2),
        "seconds_per_image_extrapolated": round(t_image, 3),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    import sys

    main(verbose="-v" in sys.argv)
