"""Decompose the full-geometry warm per-image time (benchmarks/e2e_cli.json).

Round-5: resident core + tiled VAE measured 39.6 s warm vs ~17.3 s composed
device time. This probe times each phase of the warm path separately on the
real chip, at exactly the e2e_cli.py configuration, so the remaining
overhead has a name before it gets optimized:

  tokens   — build_conditions -> prepare_control_tokens (host glyph/canny +
             tiled cond VAE encodes incl. one VAE host->device upload)
  init     — prepare_latents (glyph-latent init: one more tiled VAE encode
             pass + upload)
  sample   — the fused 30-step sampler from packed noise (latent output)
  decode   — tiled VAE decode incl. upload + host blending
  png      — PIL encode to disk
  vae_up   — one bare VAE host->device device_put (shared by the tiled
             passes above; measured alone to price it)

Writes benchmarks/e2e_phase_probe.json.

Usage:  python benchmarks/e2e_phase_probe.py [--steps 30] [--size 1024]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def best_of(fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--output",
                    default=str(ROOT / "benchmarks" / "e2e_phase_probe.json"))
    args = ap.parse_args(argv)

    import jax
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
    pipe_cfg = PipelineConfig(
        height=size, width=size, num_inference_steps=steps,
        controlnet_conditioning_step=steps,
    )
    pipe = FluxRepTextPipeline.create(
        flux_cfg=FluxConfig(), cn_cfg=ControlNetConfig(), vae_cfg=VAEConfig(),
        pipe_cfg=pipe_cfg, clip_cfg=CLIPConfig(), t5_cfg=T5Config(),
        compute_dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        fp8_random_init=True,
    )
    pipe.quantize_weights()
    pipe.enable_vae_tiling()

    text = "مرحبا"
    conds = build_conditions(
        [TextLine(text, (size // 4, size // 3), font_size=max(24, size // 13))],
        size, size,
    )
    prompt = build_prompt("a street sign in city", [text],
                          ", filmfotos, film grain, reversal film photography")
    clip_ids, t5_ids = _tokenize(prompt, pipe.clip.config, pipe.t5.config, None)
    pe, pl_ = pipe.encode_prompt(clip_ids, t5_ids)

    # one full warm-up image: all compiles + the residency swap
    t0 = time.time()
    img = pipe(conds, prompt_embeds=pe, pooled_embeds=pl_, seed=42)
    print(f"warmup image (compiles): {time.time() - t0:.1f}s", flush=True)

    out = {"config": f"{size}^2, {steps} steps, (19,38)+CN fp8w, "
                     "resident core + tiled VAE (e2e_cli protocol)"}

    def record(key, fn, n=2):
        out[key] = round(best_of(fn, n), 2)
        print(f"{key}: {out[key]}s", flush=True)
        Path(args.output).write_text(json.dumps(out, indent=1))

    rng = jax.random.PRNGKey(0)
    record("vae_upload_s", lambda: jax.block_until_ready(
        pipe._vae_device_params()))
    record("tokens_s", lambda: jax.block_until_ready(
        pipe.prepare_control_tokens(conds, rng)[0]))
    record("init_s", lambda: jax.block_until_ready(
        pipe.prepare_latents(rng, 1, conds.glyph_canvas, rng)))

    lat_holder = {}

    def latent_call():
        lat_holder["lat"] = jax.block_until_ready(pipe(
            conds, prompt_embeds=pe, pooled_embeds=pl_, seed=43,
            output_type="latent"))
    record("latent_call_s", latent_call)
    out["sample_only_s"] = round(
        out["latent_call_s"] - out["tokens_s"] - out["init_s"], 2)

    img_holder = {}

    def decode_call():
        img_holder["img"] = pipe._decode(lat_holder["lat"])
    record("decode_s", decode_call)

    from reptext_tpu.utils.image import postprocess_images
    arr = np.asarray(postprocess_images(img_holder["img"])[0])
    record("png_s", lambda: Image.fromarray(arr).save("/tmp/phase_probe.png"))

    total = out["latent_call_s"] + out["decode_s"] + out["png_s"]
    out["sum_warm_s"] = round(total, 2)
    out["note"] = ("sum_warm_s ~ e2e_cli warm_seconds_per_image; "
                   "tokens/init each include a tiled-VAE pass with its own "
                   "host->device VAE upload (vae_upload_s each)")
    Path(args.output).write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
