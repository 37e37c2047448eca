"""Benchmark: RepText 1024^2 FLUX sampling throughput on the local TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Op-point = the reference driver's defaults (RepText/infer.py:115,123-129):
1024^2, 30 steps, guidance 3.5, ControlNet active on ALL steps
(controlnet_conditioning_step == num_inference_steps == 30), 1 text line.
The CLI here defaults to the same (--steps 30 --controlnet-step 30).

Method:
- The REAL fused per-step graph (base FLUX fwd + ControlNet fwd with regional
  masking + Euler update, one XLA program) is timed at full width (3072 /
  24 heads / bf16) but reduced transformer depth, because full FLUX.1-dev is
  12B params = 24GB bf16 — a multi-chip model on 16GB v5e chips (parallel/).
- Depth->time is measured at FOUR bf16 depth points and fitted linearly
  (homogeneous blocks => exact); the middle-point residual of the fit is
  reported so the extrapolation's linearity is checked, not assumed.
- The TRUE full-depth (19,38) step is ALSO measured directly using fp8
  weight-only storage (io/quantize.py: ~12GB resident, bf16 MXU math,
  per-layer in-scan dequant); the fp8-vs-bf16 overhead measured at (8,16)
  converts it to an implied bf16 step, cross-checking the fit's endpoint
  by execution (`full_depth_fit_validation_err`).
- The HEADLINE `value` is the MEASURED full-depth (19,38)+CN step (fp8
  weights = the single-chip deployment form of the 12B model), protocol-
  corrected to the deployment dispatch regime by a chain=True vs chain=False
  calibration at (8,16) (VERDICT r3 #1); the depth-fit composition is kept
  as `images_per_min_extrapolated` and the two are cross-checked in
  `measured_vs_fit_step_discrepancy`.
- The actual production `lax.scan` sampler (sampling/sampler.py: gating,
  line-batched ControlNet, regional masking, Euler) is ALSO timed end-to-end
  at reduced depth; its per-step overhead factor vs the bare step fn is
  applied to the full-depth estimate, so scan/masking overhead is inside the
  headline number.
- Per-image one-time costs are measured and added: VAE decode, 2x VAE encode
  (canny + position condition, pipeline prepare_control_tokens), CLIP+T5
  prompt encode.

Baseline: no published reference throughput exists (BASELINE.md). Bracket
from first principles + public FLUX.1-dev A100 figures: base FLUX.1-dev bf16
on A100-80GB runs ~0.5-0.7 it/s at 1024^2 (community diffusers benchmarks);
RepText adds a ControlNet forward every step, FLOPs ratio
(4 + 10/2)/(19 + 38/2) ~= 0.24. At 30 steps that gives
60 / (30 * [1.43..2.0s] * 1.24) = 1.0..1.6 images/min. We take 2.4 img/min —
an A100 at a generous 0.93s/step including ControlNet — as the conservative
denominator (least favorable to this repo) and report the bracket.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import time

import jax
import jax.numpy as jnp

STEPS = 30                      # reference op-point: infer.py:123-129
A100_IMAGES_PER_MIN = 2.4       # conservative denominator (see module docstring)
A100_IMAGES_PER_MIN_BRACKET = (1.0, 2.4)

# measured depths (fit on one chip alongside activations); full = FLUX.1-dev.
# (8, 16) = 16 depth-units ~= 5B params ~= 10GB bf16 resident — the deepest
# config that reliably fits a 16GB chip with batch-1 4096-token activations
# (VERDICT r2 #3: a measured point 84%% of the way to full depth in units,
# vs the previous deepest (6,12) at 6x extrapolation).
DEPTHS = [(2, 4), (4, 8), (6, 12), (8, 16)]
# attempted opportunistically (try/except OOM): ~6.3B params ~= 12.6GB bf16
STRETCH_DEPTH = (10, 20)
FULL_DOUBLE, FULL_SINGLE = 19, 38
CN_DOUBLE, CN_SINGLE = 4, 10    # RepText ControlNet depth

B, S_TXT, LAT = 1, 512, 128     # batch, text tokens, 1024/8 latent side
S_IMG = (LAT // 2) * (LAT // 2)  # 4096 packed image tokens


def _depth_units(double: int, single: int) -> float:
    """Single blocks cost ~half a double block (one stream vs two)."""
    return double + single / 2


def build_step(num_double: int, num_single: int, with_cn: bool, batch: int = B,
               cn_extra: int = 64, weight_quant: bool = False):
    from reptext_tpu.configs import ControlNetConfig, FluxConfig
    from reptext_tpu.io.quantize import random_params_like
    from reptext_tpu.models import FluxTransformer2D, RepTextControlNet
    from reptext_tpu.ops.latents import prepare_latent_image_ids

    flux_cfg = dataclasses.replace(
        FluxConfig(), num_layers=num_double, num_single_layers=num_single
    )
    model = FluxTransformer2D(flux_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                              weight_quant=weight_quant)

    rng = jax.random.PRNGKey(0)
    hidden = jax.random.normal(rng, (batch, S_IMG, 64), jnp.bfloat16)
    ctx = jax.random.normal(rng, (batch, S_TXT, 4096), jnp.bfloat16)
    pooled = jax.random.normal(rng, (batch, 768), jnp.bfloat16)
    t = jnp.full((batch,), 0.5, jnp.bfloat16)
    img_ids = prepare_latent_image_ids(LAT, LAT)
    txt_ids = jnp.zeros((S_TXT, 3))
    guidance = jnp.full((batch,), 3.5, jnp.bfloat16)
    if weight_quant:
        # fp8 weight-only storage (io/quantize.py): params are synthesized
        # host-side in storage format from init SHAPES — full FLUX.1-dev
        # (24GB bf16) cannot init on-device, but its 12GB fp8 form runs.
        init_model = FluxTransformer2D(
            flux_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
        )
        shapes = jax.eval_shape(
            init_model.init, rng, hidden, ctx, pooled, t, img_ids, txt_ids,
            guidance)
        params = jax.device_put({"params": random_params_like(shapes["params"])})
    else:
        params = jax.jit(model.init)(
            rng, hidden, ctx, pooled, t, img_ids, txt_ids, guidance)

    # params MUST be threaded as arguments all the way into the timing jit:
    # closure capture bakes them into the program as constants (gigabytes
    # shipped to the compiler).
    if not with_cn:
        def fn(p, h):
            return model.apply(p, h, ctx, pooled, t, img_ids, txt_ids, guidance)
        return fn, params, hidden

    cn_cfg = dataclasses.replace(
        ControlNetConfig(), num_layers=CN_DOUBLE, num_single_layers=CN_SINGLE,
        extra_condition_channels=cn_extra,
    )
    cn = RepTextControlNet(cn_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                           weight_quant=weight_quant)
    cond = jax.random.normal(
        rng, (batch, S_IMG, 64 + cn_extra), jnp.bfloat16
    )
    if weight_quant:
        init_cn = RepTextControlNet(
            cn_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
        )
        cn_shapes = jax.eval_shape(
            init_cn.init, rng, hidden, cond, ctx, pooled, t, img_ids, txt_ids,
            guidance)
        cn_params = jax.device_put(
            {"params": random_params_like(cn_shapes["params"], seed=1)})
    else:
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


def build_inpaint_step(num_double: int, num_single: int,
                       lat_h: int = 120, lat_w: int = 160,
                       with_cn: bool = True):
    """The inpaint OP-POINT step (RepText/infer_inpaint.py:66-68,132-151):
    true-CFG batch 2, base + RepText CN (128-feat cond) + inpaint CN
    (68-feat cond) running EVERY step, at the reference inpaint geometry
    1280x960 -> 160x120 latent -> 4800 packed tokens. Exercises the
    non-square RoPE grid and the attention kernel's >4608-token path."""
    from reptext_tpu.configs import ControlNetConfig, FluxConfig
    from reptext_tpu.models import FluxTransformer2D, RepTextControlNet
    from reptext_tpu.ops.latents import prepare_latent_image_ids

    batch = 2  # CFG [neg; pos]
    s_img = (lat_h // 2) * (lat_w // 2)
    flux_cfg = dataclasses.replace(
        FluxConfig(), num_layers=num_double, num_single_layers=num_single
    )
    model = FluxTransformer2D(flux_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    hidden = jax.random.normal(rng, (batch, s_img, 64), jnp.bfloat16)
    ctx = jax.random.normal(rng, (batch, S_TXT, 4096), jnp.bfloat16)
    pooled = jax.random.normal(rng, (batch, 768), jnp.bfloat16)
    t = jnp.full((batch,), 0.5, jnp.bfloat16)
    img_ids = prepare_latent_image_ids(lat_h, lat_w)
    txt_ids = jnp.zeros((S_TXT, 3))
    guidance = jnp.full((batch,), 3.5, jnp.bfloat16)
    params = jax.jit(model.init)(
        rng, hidden, ctx, pooled, t, img_ids, txt_ids, guidance
    )

    if not with_cn:
        # base-only CFG pair at the inpaint geometry: gives the base depth
        # slope at 4800 tokens/batch 2 without the ~5.7GB dual-CN params
        # (base(3,6)+2 CNs measured 16.35G > 15.75G HBM)
        def fn(p, h):
            return model.apply(p, h, ctx, pooled, t, img_ids, txt_ids, guidance)
        return fn, params, hidden

    def make_cn(extra):
        cfg = dataclasses.replace(
            ControlNetConfig(), num_layers=CN_DOUBLE, num_single_layers=CN_SINGLE,
            extra_condition_channels=extra,
        )
        cn = RepTextControlNet(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
        cond = jax.random.normal(rng, (batch, s_img, 64 + extra), jnp.bfloat16)
        p = jax.jit(cn.init)(
            rng, hidden, cond, ctx, pooled, t, img_ids, txt_ids, guidance
        )
        return cn, p, cond

    cn_rep, p_rep, cond_rep = make_cn(64)   # canny+position: 128 feats/token
    cn_inp, p_inp, cond_inp = make_cn(4)    # 17ch packed: 68 feats/token

    def fn(p, h):
        b1, s1 = cn_rep.apply(
            p["rep"], h, cond_rep, ctx, pooled, t, img_ids, txt_ids, guidance
        )
        b2, s2 = cn_inp.apply(
            p["inp"], h, cond_inp, ctx, pooled, t, img_ids, txt_ids, guidance
        )
        return model.apply(
            p["base"], h, ctx, pooled, t, img_ids, txt_ids, guidance,
            controlnet_block_samples=b1 + b2,
            controlnet_single_block_samples=s1 + s2,
        )

    return fn, {"base": params, "rep": p_rep, "inp": p_inp}, hidden


def build_sampler(num_double: int, num_single: int, sampler_steps: int,
                  vc_interval: int = 1, vc_warmup: int = 8,
                  vc_mode: str = "reuse", vc_threshold: float = 0.05,
                  vc_max_skip: int = 3):
    """The REAL production sampler graph (sampling/sampler.py): lax.scan over
    FlowMatch steps with step-gating, line-batched ControlNet + regional
    masking, Euler update — exactly what pipelines/txt2img.py runs."""
    from reptext_tpu.configs import ControlNetConfig, FluxConfig, PipelineConfig
    from reptext_tpu.models import FluxTransformer2D, RepTextControlNet
    from reptext_tpu.ops.latents import prepare_latent_image_ids
    from reptext_tpu.sampling import build_schedule
    from reptext_tpu.sampling.sampler import make_txt2img_sampler

    flux_cfg = dataclasses.replace(
        FluxConfig(), num_layers=num_double, num_single_layers=num_single
    )
    cn_cfg = dataclasses.replace(
        ControlNetConfig(), num_layers=CN_DOUBLE, num_single_layers=CN_SINGLE
    )
    pipe_cfg = PipelineConfig(
        height=1024, width=1024, num_inference_steps=sampler_steps,
        controlnet_conditioning_step=sampler_steps,   # CN on all steps (op-point)
        velocity_cache_interval=vc_interval, velocity_cache_warmup=vc_warmup,
        velocity_cache_mode=vc_mode, velocity_cache_threshold=vc_threshold,
        velocity_cache_max_skip=vc_max_skip,
    )
    model = FluxTransformer2D(flux_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    cn = RepTextControlNet(cn_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    hidden = jax.random.normal(rng, (B, S_IMG, 64), jnp.bfloat16)
    ctx = jax.random.normal(rng, (B, S_TXT, 4096), jnp.bfloat16)
    pooled = jax.random.normal(rng, (B, 768), jnp.bfloat16)
    t = jnp.full((B,), 0.5, jnp.bfloat16)
    img_ids = prepare_latent_image_ids(LAT, LAT)
    txt_ids = jnp.zeros((S_TXT, 3))
    guidance = jnp.full((B,), 3.5, jnp.float32)
    cond_tokens = jax.random.normal(rng, (1, S_IMG, 128), jnp.bfloat16)  # 1 line
    token_masks = jnp.ones((1, S_IMG, 1), jnp.float32)

    flux_params = jax.jit(model.init)(
        rng, hidden, ctx, pooled, t, img_ids, txt_ids, guidance
    )
    cn_params = jax.jit(cn.init)(
        rng, hidden, cond_tokens, ctx, pooled, t, img_ids, txt_ids, guidance
    )

    schedule = build_schedule(
        sampler_steps, pipe_cfg.image_seq_len, pipe_cfg.base_image_seq_len,
        pipe_cfg.max_image_seq_len, pipe_cfg.base_shift, pipe_cfg.max_shift,
        pipe_cfg.use_dynamic_shifting,
    )

    def flux_apply(p, x, c, pl, tt, iid, tid, g, br, sr):
        return model.apply(p, x, c, pl, tt, iid, tid, g,
                           controlnet_block_samples=br,
                           controlnet_single_block_samples=sr)

    def cn_apply(p, x, cnd, c, pl, tt, iid, tid, g, scale):
        return cn.apply(p, x, cnd, c, pl, tt, iid, tid, g,
                        conditioning_scale=scale)

    sample = make_txt2img_sampler(flux_apply, cn_apply, schedule, pipe_cfg,
                                  jnp.bfloat16)
    latents = jax.random.normal(rng, (B, S_IMG, 64), jnp.float32)

    def fn(p, lat):
        return sample(p["flux"], p["cn"], lat, cond_tokens, token_masks,
                      ctx.astype(jnp.float32), pooled.astype(jnp.float32),
                      txt_ids, img_ids, guidance)

    return fn, {"flux": flux_params, "cn": cn_params}, latents


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


def build_vae_encode():
    """Full FLUX VAE encoder at 1024^2 (2x per line: canny + position cond,
    pipeline prepare_control_tokens; RepText/pipeline_flux_controlnet.py:663-731)."""
    from reptext_tpu.configs import VAEConfig
    from reptext_tpu.nn.vae import AutoencoderKL

    cfg = VAEConfig()
    vae = AutoencoderKL(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 1024, 1024, 3), jnp.bfloat16)
    params = jax.jit(vae.init)(rng, img[:, :64, :64, :])

    def fn(p, x):
        return vae.apply(p, x, rng, method="encode")

    return fn, params, img


def build_text_encode():
    """Full CLIP-L pooled + T5-XXL sequence prompt encode (once per image)."""
    from reptext_tpu.configs import CLIPConfig, T5Config
    from reptext_tpu.nn.clip import CLIPTextEncoder
    from reptext_tpu.nn.t5 import T5Encoder

    clip = CLIPTextEncoder(CLIPConfig(), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    t5 = T5Encoder(T5Config(), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    clip_ids = jnp.ones((1, 77), jnp.int32)
    t5_ids = jnp.ones((1, S_TXT), jnp.int32)
    clip_params = jax.jit(clip.init)(rng, clip_ids)
    t5_params = jax.jit(t5.init)(rng, t5_ids)

    def fn(p, ids):
        _, pooled = clip.apply(p["clip"], ids["clip"])
        seq = t5.apply(p["t5"], ids["t5"])
        return jnp.sum(pooled.astype(jnp.float32)) + jnp.sum(seq.astype(jnp.float32))

    return fn, {"clip": clip_params, "t5": t5_params}, {"clip": clip_ids, "t5": t5_ids}


def timeit(fn, params, x, iters=10, chain=True, perturb=None):
    """Honest timing against the remote-TPU tunnel.

    The tunnel acks dispatches (and block_until_ready) before real completion
    and content-caches identical requests, so:
    - chain=True: iterations are chained in-graph (each input depends on the
      previous output) inside ONE compiled program, and a scalar reduction is
      fetched. Requires fn output shape == input shape.
    - chain=False: each timed dispatch gets a DISTINCT pre-staged input
      (defeats content caching) and fetches a scalar per call.
    """
    # Best-of-N timed calls: one host hiccup or tunnel stall during THE
    # timed call otherwise corrupts the point (observed: a contended run
    # produced a non-monotonic depth sweep, (8,16) at 2.2x its clean time).
    # min() is the honest estimator for a lower-bound latency measurement.
    if chain:
        def chained(p, h):
            def body(i, hh):
                return fn(p, hh).astype(h.dtype)
            out = jax.lax.fori_loop(0, iters, body, h)
            return jnp.sum(out.astype(jnp.float32))
        jc = jax.jit(chained)
        float(jc(params, x))  # compile + first run
        best = math.inf
        for _ in range(3):
            start = time.perf_counter()
            float(jc(params, x))
            best = min(best, time.perf_counter() - start)
        return best / iters

    if perturb is None:
        def perturb(v, i):
            return v + jnp.asarray(i * 1e-3, v.dtype)
    xs = [jax.tree_util.tree_map(lambda v: perturb(v, i), x) for i in range(iters)]
    xs = jax.device_put(xs)
    jfn = jax.jit(lambda p, v: jnp.sum(fn(p, v).astype(jnp.float32)))
    float(jfn(params, xs[0]))  # compile + first run
    best = math.inf
    for _ in range(2):
        start = time.perf_counter()
        for i in range(iters):
            float(jfn(params, xs[i]))
        best = min(best, time.perf_counter() - start)
    return best / iters


def _lstsq_line(xs, ys):
    """Least-squares fit y = a + b*x; returns (a, b)."""
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    return my - b * mx, b


def main(verbose: bool = False):
    import gc
    import sys

    # Persistent compile cache: the depth sweep compiles ~a dozen large graph
    # signatures; reruns on the same host (driver retries, A/B sessions) load
    # them from disk instead of paying minutes of tunnel compiles again.
    # Runtime measurements are unaffected (the cache only skips compilation).
    from reptext_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    def log(msg):
        if verbose:
            print(msg, file=sys.stderr, flush=True)

    def measure(label, builder, **kw):
        """Build, time, then drop the model so HBM is freed between phases."""
        log(f"building {label}...")
        fn, params, x = builder()
        log(f"timing {label}...")
        t = timeit(fn, params, x, **kw)
        log(f"{label}: {t*1e3:.1f}ms")
        del fn, params, x
        gc.collect()
        return t

    # ---- base transformer step at four depths -> linear depth fit
    depth_ts = []
    depths = list(DEPTHS)
    for d, s in depths:
        depth_ts.append(measure(f"base depth ({d},{s})",
                                lambda d=d, s=s: build_step(d, s, False)))
    # opportunistic stretch point (~12.6GB bf16 params): measured if it fits
    stretch_ms = None
    try:
        t_stretch = measure(
            f"base depth {STRETCH_DEPTH} (stretch)",
            lambda: build_step(*STRETCH_DEPTH, False))
        depths.append(STRETCH_DEPTH)
        depth_ts.append(t_stretch)
        stretch_ms = round(t_stretch * 1e3, 2)
    except Exception as e:  # noqa: BLE001 — expected: RESOURCE_EXHAUSTED
        log(f"stretch depth {STRETCH_DEPTH} skipped: {type(e).__name__}")
    units = [_depth_units(d, s) for d, s in depths]
    # prediction check at the DEEPEST point: fit on all shallower points,
    # predict the deepest, report the relative error (the honest version of
    # "is the 19+38 extrapolation linear?")
    a_sh, b_sh = _lstsq_line(units[:-1], depth_ts[:-1])
    deepest_pred_err = abs(depth_ts[-1] - (a_sh + b_sh * units[-1])) / depth_ts[-1]
    # final fit uses every measured point
    overhead, per_unit = _lstsq_line(units, depth_ts)
    overhead = max(overhead, 0.0)
    # linearity check: middle point vs the line through the outer two
    a2, b2 = _lstsq_line([units[0], units[-1]], [depth_ts[0], depth_ts[-1]])
    lin_residual = abs(depth_ts[1] - (a2 + b2 * units[1])) / depth_ts[1]

    # ---- fp8 weight-only storage: the TRUE full-depth model, MEASURED.
    # 19+38 at full width with fp8-e4m3 per-channel weight storage
    # (io/quantize.py) is ~12GB resident and fits the 16GB chip; MXU math
    # stays bf16 (each scan slice dequantized in-loop). The (8,16) fp8
    # point isolates the dequant overhead against the bf16 measurement
    # above, so the measured full-depth step also validates the depth
    # fit's 19+38 endpoint (previous rounds could only extrapolate).
    t_fp8_816 = measure("fp8w base (8,16)",
                        lambda: build_step(8, 16, False, weight_quant=True))
    fp8_overhead = t_fp8_816 / depth_ts[DEPTHS.index((8, 16))]
    t_fp8_full = measure(
        "fp8w base FULL (19,38)",
        lambda: build_step(FULL_DOUBLE, FULL_SINGLE, False, weight_quant=True))
    full_units_early = _depth_units(FULL_DOUBLE, FULL_SINGLE)
    implied_bf16_full = t_fp8_full / fp8_overhead
    full_fit_validation_err = abs(
        implied_bf16_full - (overhead + per_unit * full_units_early)
    ) / implied_bf16_full
    # Protocol calibration (VERDICT r3 #1): the full base+CN measurement
    # below uses chain=False (distinct pre-staged inputs per dispatch) while
    # the depth sweep uses chain=True (in-graph fori_loop). chain=False pays
    # per-dispatch tunnel overhead; quantify it at (8,16) by timing the SAME
    # program under BOTH protocols, and use the factor to correct the
    # full-depth measurement to the chained (deployment lax.scan) protocol.
    t_816_unchained = measure("base (8,16) chain=False (protocol calib)",
                              lambda: build_step(8, 16, False),
                              iters=3, chain=False)
    # per-dispatch overhead is ADDITIVE (fixed RPC + host-sync latency per
    # call; inputs are pre-staged and the fetch is one scalar either way),
    # so the correction subtracts the absolute delta, not a ratio
    protocol_overhead_ms = max(
        t_816_unchained - depth_ts[DEPTHS.index((8, 16))], 0.0)
    # full base + full-depth RepText CN, both fp8 (~15GB). chain=True first
    # (the exact deployment protocol — previously the chained 57-layer
    # two-model program crashed the remote AOT compile helper; retried each
    # run since the persistent compile cache may carry it); chain=False
    # fallback is protocol-corrected by the measured dispatch factor.
    t_fp8_full_cn = None
    fp8_full_cn_protocol = None
    try:
        t_fp8_full_cn = measure(
            "fp8w FULL base+CN (19,38 + 4,10) chained",
            lambda: build_step(FULL_DOUBLE, FULL_SINGLE, True,
                               weight_quant=True),
            iters=3, chain=True)
        fp8_full_cn_protocol = "chained"
    except Exception as e:  # noqa: BLE001 — AOT helper crash / RESOURCE_EXHAUSTED
        log(f"fp8 full base+CN chained skipped: {type(e).__name__}: {e}")
    if t_fp8_full_cn is None:
        try:
            t_raw = measure(
                "fp8w FULL base+CN (19,38 + 4,10)",
                lambda: build_step(FULL_DOUBLE, FULL_SINGLE, True,
                                   weight_quant=True),
                iters=3, chain=False)
            t_fp8_full_cn = t_raw - protocol_overhead_ms
            fp8_full_cn_protocol = (
                "unchained minus %.1fms measured dispatch overhead"
                % (protocol_overhead_ms * 1e3))
        except Exception as e:  # noqa: BLE001 — expected: RESOURCE_EXHAUSTED
            log(f"fp8 full base+CN skipped: {type(e).__name__}: {e}")

    # ---- batch scaling probe: compute-bound => t(b=2) ~= 2x t(b=1); the
    # ratio is evidence for the roofline analysis (BASELINE.md), not a lever.
    t_b2 = measure("base depth A batch=2",
                   lambda: build_step(*DEPTHS[0], False, batch=2))
    batch2_ratio = t_b2 / depth_ts[0]

    # ---- ControlNet marginal cost at its real depth (step fn)
    t_cn_step = measure("step+CN", lambda: build_step(*DEPTHS[0], True))
    cn_cost = max(t_cn_step - depth_ts[0], 0.0)

    # ---- inpaint op-point components (BASELINE.md inpaint row;
    # RepText/infer_inpaint.py:132-151): CFG batch 2 x (base + RepText CN +
    # inpaint CN every step). All three full-width models at once exceed one
    # 16GB chip, so the step is derived from parts each measured directly:
    # the inpaint-CN marginal (68-feature cond embedder) and the measured
    # CFG batch-2 time ratio.
    t_icn_step = measure(
        "step+inpaintCN", lambda: build_step(*DEPTHS[0], True, cn_extra=4)
    )
    icn_cost = max(t_icn_step - depth_ts[0], 0.0)

    # ---- inpaint op-point DIRECT measurement (VERDICT r2 #6): the actual
    # dual-CN + CFG-batch-2 step at 1280x960 (4800 tokens, non-square RoPE),
    # measured at two base depths and extrapolated linearly in base depth
    # (the two CNs are fixed-depth => they live in the fit intercept).
    # The dual full-width CNs (~5.7GB bf16) + CFG-batch-2 4800-token
    # activations only fit alongside the SHALLOWEST base on the 16GB chip
    # (base (3,6) + CNs measured 16.35G > 15.75G HBM), so the full-depth
    # estimate is decomposed: dual-CN marginal measured once at (2,4), base
    # depth slope measured base-only at the same geometry/batch.
    t_inp_24 = measure("inpaint op-point step, base (2,4)",
                       lambda: build_inpaint_step(2, 4))
    inp_base_depths = [(2, 4), (6, 12)]
    inp_base_ts = [
        measure(f"inpaint base-only (CFG b2, 4800 tok), base ({d},{s})",
                lambda d=d, s=s: build_inpaint_step(d, s, with_cn=False))
        for d, s in inp_base_depths
    ]
    inp_units = [_depth_units(d, s) for d, s in inp_base_depths]
    inp_a, inp_b = _lstsq_line(inp_units, inp_base_ts)
    inp_dual_cn_cost = max(t_inp_24 - (inp_a + inp_b * inp_units[0]), 0.0)

    # ---- REAL fused sampler (lax.scan, gating, masking) at reduced depth
    sampler_steps = 10
    log("building real sampler...")
    fn_s, p_s, lat = build_sampler(*DEPTHS[0], sampler_steps)
    t_sampler = timeit(fn_s, p_s, lat, iters=2, chain=False)
    del fn_s, p_s, lat
    gc.collect()
    sampler_step = t_sampler / sampler_steps
    log(f"sampler per-step (depth {DEPTHS[0]}): {sampler_step*1e3:.1f}ms")
    # scan/masking/gating overhead relative to the bare step fn at same depth
    sampler_factor = sampler_step / t_cn_step

    # ---- velocity-cached sampler (training-free step skipping, opt-in flag
    # --velocity-cache-interval; NOT part of the headline, which stays at the
    # reference op-point). 10 steps, warmup 3, interval 2 -> 7 computed steps:
    # skipped steps should be ~free, so speedup ~= 10/7.
    vc_computed = 3 + len(range(3, sampler_steps, 2))  # warmup + every 2nd
    log("building velocity-cached sampler...")
    fn_vc, p_vc, lat_vc = build_sampler(
        *DEPTHS[0], sampler_steps, vc_interval=2, vc_warmup=3
    )
    t_sampler_vc = timeit(fn_vc, p_vc, lat_vc, iters=2, chain=False)
    del fn_vc, p_vc, lat_vc
    gc.collect()
    vc_speedup = t_sampler / t_sampler_vc
    log(f"velocity-cached sampler: {t_sampler_vc/sampler_steps*1e3:.1f}ms/step "
        f"(speedup {vc_speedup:.3f}, ideal {sampler_steps/vc_computed:.3f})")

    # ---- per-image one-time costs
    log("building VAE decode...")
    fn_v, p_v, z = build_vae_decode()
    t_vae_dec = timeit(fn_v, p_v, z, iters=5, chain=False)
    log(f"VAE decode: {t_vae_dec*1e3:.1f}ms")
    del fn_v, p_v, z
    gc.collect()

    fn_e, p_e, img = build_vae_encode()
    t_vae_enc = timeit(fn_e, p_e, img, iters=5, chain=False)
    log(f"VAE encode: {t_vae_enc*1e3:.1f}ms")
    del fn_e, p_e, img
    gc.collect()

    fn_t, p_t, ids = build_text_encode()
    t_text = timeit(
        fn_t, p_t, ids, iters=5, chain=False,
        perturb=lambda v, i: jnp.roll(v, i, axis=-1),
    )
    log(f"text encode (CLIP+T5): {t_text*1e3:.1f}ms")
    del fn_t, p_t, ids
    gc.collect()

    # ---- extrapolate to full depth at the reference op-point
    full_units = _depth_units(FULL_DOUBLE, FULL_SINGLE)
    t_full_base = overhead + per_unit * full_units
    t_full_step = (t_full_base + cn_cost) * sampler_factor  # CN on all steps
    t_image = (
        STEPS * t_full_step          # 30 fused sampler steps
        + t_vae_dec                  # decode once
        + 2 * t_vae_enc              # canny + position cond encode (1 line)
        + t_text                     # prompt encode once
    )

    images_per_min = 60.0 / t_image
    # MEASURED headline (VERDICT r3 #1): the full-depth (19,38)+CN step
    # executed directly (fp8 weight-only storage — the only form of the 12B
    # model that fits one 16GB chip, i.e. the actual single-chip deployment),
    # protocol-corrected to the deployment lax.scan dispatch regime, with the
    # measured sampler scan overhead and per-image costs on top.
    if t_fp8_full_cn is not None:
        t_image_measured = (
            STEPS * t_fp8_full_cn * sampler_factor
            + t_vae_dec + 2 * t_vae_enc + t_text
        )
        headline = 60.0 / t_image_measured
        metric_name = ("1024^2 30-step FLUX+RepText images/min/chip "
                       "(reference op-point, MEASURED full-depth fp8-weight "
                       "single-chip step)")
    else:
        headline = images_per_min
        metric_name = ("1024^2 30-step FLUX+RepText images/min/chip "
                       "(reference op-point, depth-extrapolated)")
    lo, hi = A100_IMAGES_PER_MIN_BRACKET
    result = {
        "metric": metric_name,
        "value": round(headline, 4),
        "unit": "images/min/chip",
        "vs_baseline": round(headline / A100_IMAGES_PER_MIN, 4),
        "vs_baseline_bracket": [round(headline / hi, 4),
                                round(headline / lo, 4)],
        # cross-check: the depth-fit composition of the same op-point; the
        # protocol-corrected measured step should agree to ~2%
        "images_per_min_extrapolated": round(images_per_min, 4),
        "protocol_dispatch_overhead_ms": round(protocol_overhead_ms * 1e3, 2),
        "fp8_full_cn_protocol": fp8_full_cn_protocol,
        "measured_vs_fit_step_discrepancy": (
            None if t_fp8_full_cn is None else round(
                abs(t_fp8_full_cn * sampler_factor - t_full_step)
                / t_full_step, 4)),
        "measured_step_ms_by_depth": {
            f"{d}+{s}": round(t * 1e3, 2) for (d, s), t in zip(depths, depth_ts)
        },
        "depth_fit_residual_frac": round(lin_residual, 4),
        # fit on all shallower points predicting the deepest measured point
        "depth_fit_error_at_deepest": round(deepest_pred_err, 4),
        "deepest_measured": f"{depths[-1][0]}+{depths[-1][1]}",
        "stretch_depth_step_ms": stretch_ms,
        # fp8 weight-only storage (io/quantize.py): the full 19+38 model
        # MEASURED on this chip (12GB resident), not extrapolated. The
        # dequant-overhead factor (fp8 vs bf16 at (8,16)) converts the
        # measured fp8 step into an implied bf16 step, checked against the
        # depth fit's endpoint.
        "fp8w_step_ms_8+16": round(t_fp8_816 * 1e3, 2),
        "fp8w_dequant_overhead_factor": round(fp8_overhead, 4),
        "measured_full_depth_step_ms_fp8w": round(t_fp8_full * 1e3, 2),
        "measured_full_depth_step_cn_ms_fp8w": (
            None if t_fp8_full_cn is None else round(t_fp8_full_cn * 1e3, 2)),
        "implied_bf16_full_depth_step_ms": round(implied_bf16_full * 1e3, 2),
        "full_depth_fit_validation_err": round(full_fit_validation_err, 4),
        # single-chip fp8-weight deployment throughput: fully measured step
        # (full base + full CN in one program) when that compiles, else
        # composed from the measured full-depth fp8 base step + the
        # measured CN marginal (labeled accordingly)
        "images_per_min_fp8w_measured": (
            None if t_fp8_full_cn is None else round(
                60.0 / (STEPS * t_fp8_full_cn * sampler_factor
                        + t_vae_dec + 2 * t_vae_enc + t_text), 4)),
        "images_per_min_fp8w_composed": round(
            60.0 / (STEPS * (t_fp8_full + cn_cost * fp8_overhead)
                    * sampler_factor
                    + t_vae_dec + 2 * t_vae_enc + t_text), 4),
        "batch2_step_time_ratio": round(batch2_ratio, 4),
        "controlnet_marginal_ms": round(cn_cost * 1e3, 2),
        "inpaint_cn_marginal_ms": round(icn_cost * 1e3, 2),
        # derived composition at 1024^2 (kept for cross-round continuity)
        "inpaint_extrapolated_full_step_ms": round(
            batch2_ratio * (t_full_base + cn_cost + icn_cost)
            * sampler_factor * 1e3, 2),
        # DIRECT inpaint op-point (1280x960, 4800 tokens, dual-CN, CFG b=2;
        # RepText/infer_inpaint.py:66-68,132-151): dual-CN marginal measured
        # at (2,4) + base-only depth fit at the same geometry/batch
        "inpaint_oppoint_measured_step_ms": {
            "dualcn_2+4": round(t_inp_24 * 1e3, 2),
            **{f"base_{d}+{s}": round(t * 1e3, 2)
               for (d, s), t in zip(inp_base_depths, inp_base_ts)},
        },
        "inpaint_oppoint_dual_cn_marginal_ms": round(inp_dual_cn_cost * 1e3, 2),
        "inpaint_oppoint_full_step_ms": round(
            (inp_a + inp_b * full_units + inp_dual_cn_cost)
            * sampler_factor * 1e3, 2),
        "inpaint_images_per_min": round(60.0 / (
            STEPS * (inp_a + inp_b * full_units + inp_dual_cn_cost)
            * sampler_factor
            # per-image costs scaled by the 1280x960/1024^2 pixel ratio:
            # decode + 4 cond encodes (canny, position, glyph, masked-image)
            # + prompt encode x2 (true CFG encodes the negative too)
            + 1.171875 * (t_vae_dec + 4 * t_vae_enc) + 2 * t_text), 4),
        "sampler_measured_step_ms": round(sampler_step * 1e3, 2),
        "sampler_overhead_factor": round(sampler_factor, 4),
        # opt-in velocity caching (interval=2): measured sampler speedup at
        # 10 steps, plus the implied op-point throughput at 30 steps where
        # warmup=8/interval=2 computes 20 of 30 steps. Uses the MEASURED
        # per-computed-step time (skip overhead included), depth-scaled like
        # the headline.
        "velocity_cache_sampler_speedup": round(vc_speedup, 4),
        "images_per_min_velocity_cached": round(
            60.0 / (20.0 * (t_sampler_vc / vc_computed)
                    * (t_full_step / sampler_step)
                    + t_vae_dec + 2 * t_vae_enc + t_text), 4),
        # inpaint + velocity caching (VERDICT r4 #2): sampler_inpaint.py
        # carries the same cache modes; per-computed-step cost = the inpaint
        # full step scaled by the measured cached-sampler per-computed-step
        # overhead ratio (skip steps are one Euler update, ~free)
        "inpaint_images_per_min_velocity_cached": round(60.0 / (
            20.0 * (inp_a + inp_b * full_units + inp_dual_cn_cost)
            * sampler_factor * ((t_sampler_vc / vc_computed) / sampler_step)
            + 1.171875 * (t_vae_dec + 4 * t_vae_enc) + 2 * t_text), 4),
        "vae_decode_ms": round(t_vae_dec * 1e3, 2),
        "vae_encode_ms": round(t_vae_enc * 1e3, 2),
        "text_encode_ms": round(t_text * 1e3, 2),
        "extrapolated_full_step_ms": round(t_full_step * 1e3, 2),
        "seconds_per_image_extrapolated": round(t_image, 3),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    # freshest fidelity run by mtime: local results/ (gitignored) vs the
    # committed artifact (benchmarks/fidelity_latest.json travels with the
    # repo) — a stale local file must not shadow a newer committed one
    candidates = [p for p in ("results/fidelity.json",
                              "benchmarks/fidelity_latest.json")
                  if os.path.isfile(p)]
    fid_path = max(candidates, key=os.path.getmtime) if candidates else None
    if fid_path:
        fid = json.loads(open(fid_path).read())
        result["glyph_fidelity"] = {
            "mean_sampled_edge_iou": fid["mean_sampled_edge_iou"],
            "mean_sampled_ink_corr": fid["mean_sampled_ink_corr"],
            "weights": fid["weights"],
        }
        for key in ("mean_cached_edge_iou", "velocity_cache_pixel_mad",
                    "mean_sampled_edge_f1", "mean_perfect_edge_f1",
                    "char_accuracy_sampled", "char_accuracy_cached",
                    "char_accuracy_perfect", "char_accuracy_noise_floor",
                    "velocity_cache_char_acc_delta",
                    "velocity_cache_acceptable"):
            if key in fid:
                result["glyph_fidelity"][key] = fid[key]
    # adaptive velocity-cache A/B (benchmarks/adaptive_cache_ab.py): measured
    # trigger overhead + skip-mechanics speedup; recorded artifact, not
    # re-measured per bench run (the trigger is weight-independent mechanics)
    if os.path.isfile("benchmarks/adaptive_cache_ab.json"):
        ab = json.loads(open("benchmarks/adaptive_cache_ab.json").read())
        result["adaptive_cache"] = {
            k: ab[k] for k in (
                "trigger_overhead_pct", "speedup_adaptive_skip",
                "ideal_adaptive_skip", "computed_steps",
            ) if k in ab
        }
    # trained-weights end-to-end proof (examples/overfit_e2e.py): the only
    # non-random-weight fidelity evidence available without network egress
    if os.path.isfile("benchmarks/overfit_e2e.json"):
        ov = json.loads(open("benchmarks/overfit_e2e.json").read())
        result["overfit_e2e"] = {
            k: ov[k] for k in (
                "char_accuracy_trained", "char_accuracy_random",
                "char_accuracy_holdout", "mean_edge_iou_holdout",
                "mean_edge_iou_trained", "mean_edge_iou_random",
                "vae_recon_psnr_db", "protocol",
            ) if k in ov
        }
    # full-geometry CLI rehearsal (benchmarks/e2e_cli.py, VERDICT r3 #4):
    # wall-clock of the real deployment command at (19,38)+CN fp8w 1024^2
    if os.path.isfile("benchmarks/e2e_cli.json"):
        ec = json.loads(open("benchmarks/e2e_cli.json").read())
        result["e2e_cli_seconds_per_image"] = ec.get("warm_seconds_per_image")
        result["e2e_cli"] = {
            k: ec[k] for k in (
                "config", "setup_seconds", "first_image_seconds",
                "warm_seconds_per_image", "warm_seconds_all",
                "images_per_min_delivered",
            ) if k in ec
        }
    # trained-checkpoint gates (benchmarks/trained_gates.py, VERDICT r3 #2):
    # velocity-cache / adaptive / fp8 char-accuracy deltas measured against a
    # TRAINED demo checkpoint instead of random-init wiring checks
    if os.path.isfile("benchmarks/trained_gates.json"):
        tg = json.loads(open("benchmarks/trained_gates.json").read())
        result["trained_gates"] = {
            k: tg[k] for k in (
                "char_accuracy_uncached", "char_accuracy_vc_fixed",
                "char_accuracy_vc_adaptive", "char_accuracy_fp8w",
                "vc_fixed_delta", "vc_adaptive_delta", "fp8w_delta",
                "vc_fixed_acceptable", "vc_adaptive_acceptable",
                "fp8w_acceptable", "weights", "protocol",
            ) if k in tg
        }
    payload = _drop_nonfinite(result)
    # persist the FULL result (VERDICT r4 weak #6: the driver keeps only a
    # 2000-char tail of stdout, which truncates the headline fields) — the
    # committed benchmarks/bench_latest.json is the durable artifact
    try:
        with open("benchmarks/bench_latest.json", "w") as f:
            json.dump(payload, f, indent=1)
    except OSError as e:
        print(f"WARN: could not write benchmarks/bench_latest.json: {e}",
              file=sys.stderr)
    print(json.dumps(payload))


def _drop_nonfinite(obj):
    """Replace non-finite floats with None so the output line is STRICT
    JSON (json.dumps happily emits NaN/Infinity, which many parsers —
    including the driver's — reject)."""
    if isinstance(obj, dict):
        return {k: _drop_nonfinite(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_drop_nonfinite(v) for v in obj]
    if isinstance(obj, float) and not math.isfinite(obj):
        return None
    return obj


if __name__ == "__main__":
    import sys

    main(verbose="-v" in sys.argv)
