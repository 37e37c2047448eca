"""Full-geometry end-to-end rehearsal on the real chip (VERDICT r3 #4).

bench.py's headline composes synthetic step functions; this certifies the
DEPLOYMENT path at scale instead: the TRUE (19,38)+CN geometry with fp8
weight-only storage (the single-chip resident form), 1024^2, 30 steps,
through the real pipeline — CLIP/T5 prompt encode, cond VAE encodes, the
sequential-residency swap (encoders out, fp8 core synthesized into the
layout-matched program), the fused lax.scan sampler, the core->VAE offload
hop, decode, PNG write.

Protocol: ONE process (the persistent compile cache is NOT used — the
remote AOT cache keys ignore entry layouts and can return stale-layout
executables for this program family; in-process jit caching covers the
warm path). Image 1 pays all compiles; image 2 is the warm per-image
wall-clock (core re-synthesis + sampler + decode + PNG).

Writes benchmarks/e2e_cli.json, carried into the bench JSON as
`e2e_cli_seconds_per_image` (warm).

Usage:  python benchmarks/e2e_cli.py [--steps 30] [--size 1024]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--output", default=str(ROOT / "benchmarks" / "e2e_cli.json"))
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from reptext_tpu.cli import _tokenize, build_prompt
    from reptext_tpu.conditioning import TextLine, build_conditions
    from reptext_tpu.configs import (
        CLIPConfig, ControlNetConfig, FluxConfig, PipelineConfig, T5Config,
        VAEConfig,
    )
    from reptext_tpu.pipelines import FluxRepTextPipeline

    size, steps = args.size, args.steps
    t0 = time.time()
    pipe_cfg = PipelineConfig(
        height=size, width=size, num_inference_steps=steps,
        controlnet_conditioning_step=steps,       # reference op-point
    )
    pipe = FluxRepTextPipeline.create(
        flux_cfg=FluxConfig(), cn_cfg=ControlNetConfig(), vae_cfg=VAEConfig(),
        pipe_cfg=pipe_cfg, clip_cfg=CLIPConfig(), t5_cfg=T5Config(),
        compute_dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        fp8_random_init=True,
    )
    pipe.quantize_weights()
    # tile-bounded VAE keeps the fp8 core resident across images — without
    # it the offload chain re-synthesizes the ~14GB core per image
    # (round-4: 69.1 s/image warm vs 17.3 s composed device time)
    pipe.enable_vae_tiling()
    t_setup = time.time() - t0
    print(f"setup (models + encoders init): {t_setup:.1f}s", flush=True)

    text = "مرحبا"
    conds = build_conditions(
        [TextLine(text, (size // 4, size // 3), font_size=max(24, size // 13))],
        size, size,
    )
    prompt = build_prompt("a street sign in city", [text],
                          ", filmfotos, film grain, reversal film photography")
    clip_ids, t5_ids = _tokenize(prompt, pipe.clip.config, pipe.t5.config, None)

    # image 1: encoders encode the prompt, residency swap, ALL compiles
    pe, pl = pipe.encode_prompt(clip_ids, t5_ids)   # encode BEFORE eviction
    t1 = time.time()
    img = pipe(conds, prompt_embeds=pe, pooled_embeds=pl, seed=42)
    Image.fromarray(np.asarray(img[0])).save("/tmp/e2e_rehearsal.png")
    t_image1 = time.time() - t1
    print(f"image 1 (compiles + synth + sample + decode): {t_image1:.1f}s",
          flush=True)

    # images 2..3: warm — core stays resident (vae_tiling), so per-image =
    # cond encodes + compiled sampler + tiled decode + PNG
    # image 2 may pay a one-time OOM-probe retry (the pipeline tests whether
    # the uploaded VAE fits alongside the resident core during sampling and
    # remembers the answer); images 3-4 are the steady state.
    warm = []
    for i, seed in enumerate((43, 44, 45), start=2):
        t2 = time.time()
        img = pipe(conds, prompt_embeds=pe, pooled_embeds=pl, seed=seed)
        Image.fromarray(np.asarray(img[0])).save(f"/tmp/e2e_rehearsal{i}.png")
        warm.append(time.time() - t2)
        print(f"image {i} (warm per-image): {warm[-1]:.1f}s", flush=True)

    # the RECOMMENDED deployment config: adaptive velocity caching at the
    # trained-checkpoint-calibrated threshold (fidelity-gated, Δchar-acc 0
    # in benchmarks/trained_gates.json). Shares the resident core; only the
    # scan program differs (one extra compile on its image 1).
    import dataclasses as _dc

    vc_pipe = _dc.replace(pipe, pipe_cfg=_dc.replace(
        pipe.pipe_cfg, velocity_cache_mode="adaptive",
        velocity_cache_threshold=0.12, velocity_cache_max_skip=2,
        velocity_cache_warmup=8))
    warm_vc = []
    for i, seed in enumerate((46, 47), start=1):
        t2 = time.time()
        img = vc_pipe(conds, prompt_embeds=pe, pooled_embeds=pl, seed=seed)
        Image.fromarray(np.asarray(img[0])).save(f"/tmp/e2e_vc{i}.png")
        dt = time.time() - t2
        print(f"vc image {i}: {dt:.1f}s", flush=True)
        if i > 1:
            warm_vc.append(dt)      # vc image 1 pays the vc-scan compile

    result = {
        "config": f"{size}^2, {steps} steps, (19,38)+CN fp8w, random weights, "
                  "1 text line, resident core + tiled VAE",
        "setup_seconds": round(t_setup, 1),
        "first_image_seconds": round(t_image1, 1),
        "warm_seconds_per_image": round(min(warm), 1),
        "warm_seconds_all": [round(t, 1) for t in warm],
        "images_per_min_delivered": round(60.0 / min(warm), 2),
        "warm_seconds_velocity_cached": round(min(warm_vc), 1) if warm_vc else None,
        "images_per_min_velocity_cached": (
            round(60.0 / min(warm_vc), 2) if warm_vc else None),
        "note": "core synthesized ONCE (image 1); warm images = cond VAE "
                "encodes (tiled), the fused 30-step sampler, tiled VAE "
                "decode, PNG write — no per-image core re-synthesis "
                "(ops/vae_tiling.py); prompt encode measured separately "
                "by bench.py (~65ms). velocity_cached rows = the adaptive "
                "drift-triggered cache at the calibrated threshold 0.12 "
                "(opt-in deployment config; uncached rows are the headline "
                "protocol)",
    }
    Path(args.output).write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
