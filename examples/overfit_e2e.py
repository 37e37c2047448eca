"""End-to-end TRAINED-WEIGHTS fidelity demo: train VAE + FLUX + ControlNet
from scratch on synthetic glyph data, sample with the production pipeline,
and score the output with the OCR judge.

Why this exists: this environment has no network egress, so the published
FLUX/RepText checkpoints can never be downloaded — every fidelity artifact
in the repo was random-init wiring-tracking until now (VERDICT r2 "what's
weak #1"). This demo closes the gap the only way available: it TRAINS the
whole stack at small scale on the synthetic glyph-render data the framework
already generates (data.py), then proves the full production loop
(conditioning frontend -> VAE-encoded control tokens -> fused lax.scan
sampler with regional masks + glyph-latent init -> VAE decode -> OCR judge)
produces READABLE TEXT from trained weights, and that the OCR judge
separates trained from random weights.

Protocol (memorization, the honest small-compute test):
  1. train a small AutoencoderKL on the demo images (recon + tiny KL);
  2. train a small FluxTransformer2D + RepTextControlNet JOINTLY
     (sampling.train_controlnet.make_joint_train_step: region-weighted
     rectified-flow velocity loss) to overfit K fixed
     (text render, conditioning) pairs;
  3. sample each pair through FluxRepTextPipeline.__call__ at a fixed seed;
  4. OCR-judge char accuracy on the text-region crops, trained vs random.

Expected result: char_accuracy_trained >> char_accuracy_random ~ noise
floor, and edge-IoU separation on the same crops. Artifact:
benchmarks/overfit_e2e.json (+ .png sample grid), consumed by bench.py.

The reference has no training code or accuracy metric at all
(SURVEY.md §0, §6) — this is the framework's own proof obligation.

Run (real chip, ~5 min):  python examples/overfit_e2e.py
Quick wiring check (CPU): JAX_PLATFORMS=cpu python examples/overfit_e2e.py \
    --steps-vae 5 --steps-flux 5 --steps-sample 2
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

from reptext_tpu.conditioning import TextLine, build_conditions
from reptext_tpu.configs import (
    CLIPConfig, ControlNetConfig, FluxConfig, PipelineConfig, T5Config, VAEConfig,
)
from reptext_tpu.ops.latents import pack_latents, prepare_latent_image_ids
from reptext_tpu.pipelines import FluxRepTextPipeline
from reptext_tpu.sampling.train_controlnet import make_joint_train_step
from reptext_tpu.utils.image import preprocess_images

SIZE = 128

# Overfit set: Arabic + Latin + digits, all inside the OCR judge charset,
# short enough to fit a 128px canvas at a legible font size.
WORDS = ["مرحبا", "نور", "CAFE", "STOP", "سوق", "2026", "بحر", "HI"]
# --holdout mode (VERDICT r3 #2): train on a LARGER pool, score on words the
# model never saw — glyph-conditioned generation must generalize (the
# ControlNet carries the shape; memorization can't explain held-out reads).
TRAIN_WORDS = WORDS + ["ليل", "GOLD", "شمس", "1987", "MARK", "درب", "فن", "WAVE"]
HOLDOUT_WORDS = ["سلام", "TAXI", "قمر", "404", "نهر", "OK", "باب", "Fox"]
PROMPT = "a sign with text"


def synth_corpus(n: int, seed: int = 5) -> List[str]:
    """n UNIQUE synthetic words (Arabic / upper / lower / digits, 2-5 chars)
    for the corpus-scaling protocol (VERDICT r4 #7). Deterministic in seed;
    disjointness between holdout and train comes from slicing one pool."""
    from reptext_tpu.eval.ocr import ARABIC, DIGITS, LATIN, LATIN_LOWER

    rng = np.random.default_rng(seed)
    pools = [ARABIC, LATIN, LATIN_LOWER, DIGITS]
    words: List[str] = []
    seen = set()
    while len(words) < n:
        pool = pools[int(rng.integers(len(pools)))]
        w = "".join(rng.choice(list(pool))
                    for _ in range(int(rng.integers(2, 6))))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def demo_flux_cfg() -> FluxConfig:
    """Small but non-trivial geometry: 2+4 blocks, 4 heads x 64 = 256 inner."""
    return dataclasses.replace(
        FluxConfig().tiny(), attention_head_dim=64, axes_dims_rope=(8, 28, 28),
    )


def demo_cn_cfg() -> ControlNetConfig:
    return dataclasses.replace(
        ControlNetConfig().tiny(), attention_head_dim=64, axes_dims_rope=(8, 28, 28),
    )


def demo_vae_cfg() -> VAEConfig:
    """More capacity than the test-tiny VAE: recon quality bounds OCR."""
    return dataclasses.replace(
        VAEConfig().tiny(), block_out_channels=(32, 64, 64, 64), norm_num_groups=8,
    )


def build_overfit_set(size: int = SIZE, font_path: Optional[str] = None,
                      words: Optional[List[str]] = None,
                      seed: int = 7) -> List[Dict]:
    """K fixed (text, conditions, target image) samples, deterministic."""
    rnd = np.random.default_rng(seed)
    samples = []
    for i, text in enumerate(words if words is not None else WORDS):
        font_size = max(12, int(size * (0.28 if len(text) <= 4 else 0.23)))
        x_hi = max(5, size - int(0.62 * font_size * len(text)))
        y_hi = max(9, size - int(1.6 * font_size))
        x = int(rnd.integers(4, x_hi))
        y = int(rnd.integers(8, y_hi))
        color = tuple(int(v) for v in rnd.integers(170, 256, 3))
        bg = tuple(int(v) for v in rnd.integers(0, 90, 3))
        conds = build_conditions(
            [TextLine(text, (x, y), color, font_size=font_size)],
            size, size, font_path=font_path, font_size=font_size,
        )
        canvas = conds.glyph_canvas
        target = np.empty_like(canvas)
        target[:] = np.asarray(bg, np.uint8)
        ink = (canvas > 0).any(axis=-1)
        target[ink] = canvas[ink]
        samples.append({"text": text, "conds": conds, "target": target})
    return samples


# ----------------------------------------------------------------- VAE stage


def train_vae(vae, samples: List[Dict], steps: int, lr: float = 2e-3,
              batch: int = 8, seed: int = 0) -> Tuple[Dict, float]:
    """Train the AutoencoderKL (recon MSE + 1e-6 KL) on every image the
    pipeline will VAE-encode: targets, canny conds, position masks, glyph
    canvases. Returns (params, recon_psnr_db)."""
    pool = []
    for s in samples:
        lc = s["conds"].lines[0]
        pool.extend([
            s["target"], lc.canny_image,
            np.repeat(lc.position_mask[:, :, None], 3, axis=2),
            s["conds"].glyph_canvas,
        ])
    data = jnp.asarray(preprocess_images(np.stack(pool)))  # [N, H, W, 3]

    rng = jax.random.PRNGKey(seed)
    params = vae.init(rng, data[:1])
    tx = optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1), alpha=0.1))
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, imgs, rng):
        def loss_fn(p):
            mean, logvar = vae.apply(p, imgs, method="encode_moments")
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
            rec = vae.apply(p, z, method="decode")
            mse = jnp.mean((rec - imgs) ** 2)
            kl = -0.5 * jnp.mean(1 + logvar - mean ** 2 - jnp.exp(logvar))
            return mse + 1e-6 * kl, mse

        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, mse

    n = data.shape[0]
    mse = jnp.inf
    for i in range(steps):
        rng, r_pick, r_z = jax.random.split(rng, 3)
        idx = jax.random.randint(r_pick, (min(batch, n),), 0, n)
        params, opt_state, mse = step_fn(params, opt_state, data[idx], r_z)
        if i % 200 == 0 or i == steps - 1:
            print(f"vae step {i}: recon_mse={float(mse):.5f}", flush=True)
    # PSNR over the full pool, deterministic (posterior mean)
    mean, _ = vae.apply(params, data, method="encode_moments")
    rec = vae.apply(params, mean, method="decode")
    full_mse = float(jnp.mean((rec - data) ** 2))
    psnr = 10.0 * np.log10(4.0 / max(full_mse, 1e-12))  # [-1,1] range -> peak 2
    return params, float(psnr)


# ---------------------------------------------------------------- flow stage


def precompute_batch(pipe: FluxRepTextPipeline, samples: List[Dict]) -> Dict:
    """One fixed full-batch training dict through the production cond path."""
    cfg = pipe.pipe_cfg
    rng = jax.random.PRNGKey(11)
    cond_l, mask_l, x0_l = [], [], []
    for i, s in enumerate(samples):
        r_cond, r_img = jax.random.split(jax.random.fold_in(rng, i))
        ct, tm = pipe.prepare_control_tokens(s["conds"], r_cond)
        cond_l.append(ct[0])
        mask_l.append(tm[0])
        lat = pipe._encode_scaled(jnp.asarray(preprocess_images(s["target"])), r_img)
        x0_l.append(pack_latents(lat.transpose(0, 3, 1, 2))[0])

    from reptext_tpu.cli import _tokenize

    clip_ids, t5_ids = _tokenize(PROMPT, pipe.clip.config, pipe.t5.config, None)
    prompt_embeds, pooled = pipe.encode_prompt(clip_ids, t5_ids)
    b = len(samples)
    guidance = (jnp.full((b,), cfg.guidance_scale, jnp.float32)
                if pipe.flux.config.guidance_embeds else None)
    from reptext_tpu.eval.ocr import CHAR_TO_ID, MAX_LABEL
    from reptext_tpu.sampling.ocr_loss import aspect_box, glyph_ink_bbox

    ocr_boxes = np.zeros((b, 4), np.float32)
    ocr_labels = np.zeros((b, MAX_LABEL), np.int32)
    ocr_paddings = np.ones((b, MAX_LABEL), np.float32)
    for i, s in enumerate(samples):
        bbox = glyph_ink_bbox(s["conds"].glyph_canvas)
        ocr_boxes[i] = (aspect_box(bbox, cfg.height, cfg.width) if bbox
                        else np.asarray([0, 0, 1, 1], np.float32))
        ids = [CHAR_TO_ID[c] for c in s["text"] if c in CHAR_TO_ID][:MAX_LABEL]
        ocr_labels[i, : len(ids)] = ids
        ocr_paddings[i, : len(ids)] = 0.0
    return {
        "x0": jnp.stack(x0_l),
        "cond_tokens": jnp.stack(cond_l),
        "token_mask": jnp.stack(mask_l),
        "ocr_boxes": jnp.asarray(ocr_boxes),
        "ocr_labels": jnp.asarray(ocr_labels),
        "ocr_paddings": jnp.asarray(ocr_paddings),
        "prompt_embeds": jnp.broadcast_to(
            prompt_embeds, (b,) + prompt_embeds.shape[1:]),
        "pooled": jnp.broadcast_to(pooled, (b,) + pooled.shape[1:]),
        "img_ids": prepare_latent_image_ids(cfg.latent_height, cfg.latent_width),
        "txt_ids": jnp.zeros((prompt_embeds.shape[1], 3)),
        "guidance": guidance,
        "clip_ids": clip_ids, "t5_ids": t5_ids,
    }


def train_flow(pipe: FluxRepTextPipeline, batch: Dict, steps: int,
               lr: float = 2e-3, seed: int = 1,
               ocr_loss_weight: float = 0.0, judge_params=None) -> Dict:
    """Jointly train flux + controlnet to overfit the fixed batch.

    ocr_loss_weight > 0 adds the in-graph OCR CTC text-perceptual term
    (sampling/ocr_loss.py) through the FROZEN already-trained VAE decoder."""
    flux, cn = pipe.flux, pipe.controlnet

    def flux_apply(p, x, ctx, pooled, t, iid, tid, g, br, sr):
        return flux.apply(p, x, ctx, pooled, t, iid, tid, g,
                          controlnet_block_samples=br,
                          controlnet_single_block_samples=sr)

    def cn_apply(p, x, cnd, ctx, pooled, t, iid, tid, g, scale):
        return cn.apply(p, x, cnd, ctx, pooled, t, iid, tid, g,
                        conditioning_scale=scale)

    tx = optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1), alpha=0.05))
    params = {"flux": pipe.params["flux"], "controlnet": pipe.params["controlnet"]}
    opt_state = tx.init(params)
    perceptual, frozen = None, ()
    if ocr_loss_weight > 0.0:
        from reptext_tpu.ops.latents import unpack_latents

        cfg = pipe.pipe_cfg
        vcfg = pipe.vae.config

        def decode_apply(vae_params, x0_packed):
            lat = unpack_latents(x0_packed, cfg.latent_height, cfg.latent_width)
            lat = lat / vcfg.scaling_factor + vcfg.shift_factor
            return pipe.vae.apply(vae_params, lat.transpose(0, 2, 3, 1),
                                  method="decode")

        perceptual = {"decode_apply": decode_apply, "judge_apply": None,
                      "weight": ocr_loss_weight}
        frozen = (pipe.params["vae"], judge_params)
    step = jax.jit(make_joint_train_step(flux_apply, cn_apply, tx,
                                         text_loss_weight=2.0,
                                         perceptual=perceptual))
    tbatch = {k: v for k, v in batch.items() if k not in ("clip_ids", "t5_ids")}
    rng = jax.random.PRNGKey(seed)
    loss = jnp.inf
    for i in range(steps):
        rng, r = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, tbatch, r, *frozen)
        if i % 500 == 0 or i == steps - 1:
            print(f"flow step {i}: loss={float(loss):.5f}", flush=True)
    return params


# ----------------------------------------------------------------- eval stage


def sample_and_score(pipe: FluxRepTextPipeline, samples: List[Dict],
                     batch: Dict, steps_sample: int, judge) -> Dict:
    """Sample every overfit pair at a fixed seed; OCR + edge metrics."""
    from benchmarks.glyph_fidelity import score_region
    from reptext_tpu.eval import ocr as ocr_judge

    images, crops, texts, ious = [], [], [], []
    for i, s in enumerate(samples):
        img = pipe(
            s["conds"], prompt_embeds=batch["prompt_embeds"][:1],
            pooled_embeds=batch["pooled"][:1], seed=1000 + i,
            num_inference_steps=steps_sample,
        )[0]
        images.append(np.asarray(img))
        lc = s["conds"].lines[0]
        x0, y0, x1, y1 = lc.bbox
        crops.append(images[-1][y0:y1, x0:x1])
        texts.append(s["text"])
        ious.append(score_region(crops[-1], lc)["edge_iou"])
    acc = (ocr_judge.char_accuracy(crops, texts, judge)
           if judge is not None else float("nan"))
    return {"char_accuracy": acc, "mean_edge_iou": float(np.mean(ious)),
            "images": images}


def run_corpus_scaling(args) -> int:
    """Generalization vs corpus size (VERDICT r4 #7): train the demo stack
    on K synthetic words for each K in --corpus-scale, score a FIXED 32-word
    holdout every time, and report the train/holdout accuracy curve.

    One pool of unique synthetic words is sliced so the holdout (first 32)
    is disjoint from every training set; the VAE is trained ONCE on the
    largest corpus and shared (the codec is text-agnostic; only the flow
    model's generalization is under test). Flux/CN re-init from the same
    random params for every K.
    """
    t_start = time.time()
    ks = sorted({int(k) for k in args.corpus_scale.split(",")})
    pool = synth_corpus(max(ks) + 32)
    holdout_words, train_pool = pool[:32], pool[32:]
    holdout_samples = build_overfit_set(args.size, words=holdout_words, seed=23)
    samples_max = build_overfit_set(args.size, words=train_pool[:max(ks)])

    pipe_cfg = PipelineConfig(
        height=args.size, width=args.size,
        num_inference_steps=args.steps_sample,
        controlnet_conditioning_step=args.steps_sample,
    )
    pipe = FluxRepTextPipeline.create(
        flux_cfg=demo_flux_cfg(), cn_cfg=demo_cn_cfg(), vae_cfg=demo_vae_cfg(),
        pipe_cfg=pipe_cfg, clip_cfg=CLIPConfig().tiny(), t5_cfg=T5Config().tiny(),
        seed=0,
    )
    print(f"[1/3] training shared VAE on K={max(ks)} corpus "
          f"({args.steps_vae} steps)...", flush=True)
    vae_params, psnr = train_vae(pipe.vae, samples_max, args.steps_vae)
    pipe.params["vae"] = vae_params
    print(f"      recon PSNR {psnr:.1f} dB", flush=True)

    random_params = {"flux": pipe.params["flux"],
                     "controlnet": pipe.params["controlnet"]}
    from reptext_tpu.eval import ocr as ocr_judge

    judge = ocr_judge.load_judge_ensemble()
    hold_batch = precompute_batch(pipe, holdout_samples)
    res_rand = sample_and_score(pipe, holdout_samples, hold_batch,
                                args.steps_sample, judge)

    curve = []
    for k in ks:
        samples = samples_max[:k]
        print(f"[2/3] K={k}: joint FLUX+CN training "
              f"({args.steps_flux} steps, full batch {k})...", flush=True)
        pipe.params.update(random_params)   # fresh start per K
        batch = precompute_batch(pipe, samples)
        trained = train_flow(pipe, batch, args.steps_flux,
                             seed=args.train_seed)
        pipe.params.update(trained)
        res_tr = sample_and_score(pipe, samples[:16], batch,
                                  args.steps_sample, judge)
        res_ho = sample_and_score(pipe, holdout_samples, batch,
                                  args.steps_sample, judge)
        row = {
            "corpus_size": k,
            "char_accuracy_train_subset16": round(res_tr["char_accuracy"], 4),
            "char_accuracy_holdout32": round(res_ho["char_accuracy"], 4),
            "mean_edge_iou_holdout": round(res_ho["mean_edge_iou"], 4),
        }
        curve.append(row)
        print(f"      {row}", flush=True)
        # partial write per K: a late-K crash must not discard measured rows
        Path(args.output).parent.mkdir(parents=True, exist_ok=True)
        Path(args.output).write_text(json.dumps(
            {"protocol": "corpus scaling (PARTIAL — run in progress)",
             "corpus_scaling": curve}, indent=1))
        if args.params_cache:
            save_dir = f"{args.params_cache}_k{k}"
            from reptext_tpu.io.checkpoint import save_pipeline_params

            save_pipeline_params(
                {"vae": pipe.params["vae"], **trained}, save_dir)

    last = curve[-1]
    out = {
        "protocol": ("corpus scaling: train K in %s synthetic words, eval a "
                     "FIXED disjoint 32-word holdout, %d^2, %d sample steps, "
                     "%d flux steps/K, shared VAE" % (
                         ks, args.size, args.steps_sample, args.steps_flux)),
        "vae_recon_psnr_db": round(psnr, 2),
        "train_steps_vae": args.steps_vae,
        "train_steps_flux": args.steps_flux,
        "train_seed": args.train_seed,
        "corpus_scaling": curve,
        # standard keys (bench.py carries these) = the LARGEST-K run
        "char_accuracy_trained": last["char_accuracy_train_subset16"],
        "char_accuracy_holdout": last["char_accuracy_holdout32"],
        "char_accuracy_random": round(res_rand["char_accuracy"], 4),
        "mean_edge_iou_holdout": last["mean_edge_iou_holdout"],
        "mean_edge_iou_random": round(res_rand["mean_edge_iou"], 4),
        "holdout_words": holdout_words,
        "wall_s": round(time.time() - t_start, 1),
        "device": jax.devices()[0].device_kind,
    }
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    Path(args.output).write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-vae", type=int, default=2500)
    ap.add_argument("--steps-flux", type=int, default=6000)
    ap.add_argument("--steps-sample", type=int, default=20)
    ap.add_argument("--train-seed", type=int, default=1,
                    help="flow-training PRNG seed (A/B replication)")
    ap.add_argument("--ocr-loss-weight", type=float, default=0.0,
                    help="in-graph OCR CTC perceptual term during joint "
                         "training (A/B: compare char accuracy at equal, "
                         "sub-saturation step counts)")
    ap.add_argument("--size", type=int, default=SIZE)
    ap.add_argument("--output", default="benchmarks/overfit_e2e.json")
    ap.add_argument("--params-cache", default=None,
                    help="orbax dir: save trained params there (or reuse "
                         "them if present) so re-scoring skips training")
    ap.add_argument("--holdout", action="store_true",
                    help="generalization protocol: train on TRAIN_WORDS "
                         "(16), additionally score HOLDOUT_WORDS (8) the "
                         "model never saw")
    ap.add_argument("--corpus-scale", default=None, metavar="K1,K2,...",
                    help="corpus-scaling protocol (VERDICT r4 #7): train on "
                         "K synthetic words per point, score a fixed "
                         "32-word holdout; writes the curve to --output")
    args = ap.parse_args(argv)

    if args.corpus_scale:
        return run_corpus_scaling(args)

    t_start = time.time()
    train_words = TRAIN_WORDS if args.holdout else WORDS
    samples = build_overfit_set(args.size, words=train_words)
    holdout_samples = (build_overfit_set(args.size, words=HOLDOUT_WORDS,
                                         seed=23) if args.holdout else None)

    pipe_cfg = PipelineConfig(
        height=args.size, width=args.size,
        num_inference_steps=args.steps_sample,
        controlnet_conditioning_step=args.steps_sample,  # CN on all steps
    )
    pipe = FluxRepTextPipeline.create(
        flux_cfg=demo_flux_cfg(), cn_cfg=demo_cn_cfg(), vae_cfg=demo_vae_cfg(),
        pipe_cfg=pipe_cfg, clip_cfg=CLIPConfig().tiny(), t5_cfg=T5Config().tiny(),
        seed=0,
    )

    import os

    from reptext_tpu.io.checkpoint import load_pipeline_params, save_pipeline_params

    cached = (args.params_cache and
              os.path.isdir(os.path.join(args.params_cache, "flux")))
    if cached:
        print(f"[1-3/4] reusing trained params from {args.params_cache}",
              flush=True)
        saved = load_pipeline_params(args.params_cache)
        pipe.params["vae"] = saved["vae"]
        # keep the previously measured PSNR (cache reuse skips VAE training;
        # NaN here would leak into bench.py's strict-JSON line)
        psnr = None
        if os.path.isfile("benchmarks/overfit_e2e.json"):
            prev = json.load(open("benchmarks/overfit_e2e.json")).get(
                "vae_recon_psnr_db")
            if isinstance(prev, (int, float)) and math.isfinite(prev):
                psnr = float(prev)
        random_params = {"flux": pipe.params["flux"],
                         "controlnet": pipe.params["controlnet"]}
        batch = precompute_batch(pipe, samples)
        trained = {"flux": saved["flux"], "controlnet": saved["controlnet"]}
    else:
        print(f"[1/4] training VAE ({args.steps_vae} steps)...", flush=True)
        vae_params, psnr = train_vae(pipe.vae, samples, args.steps_vae)
        pipe.params["vae"] = vae_params
        print(f"      recon PSNR {psnr:.1f} dB", flush=True)

        print("[2/4] building the fixed training batch (production cond "
              "path)...", flush=True)
        batch = precompute_batch(pipe, samples)

        # Control: random-init flux/CN with the SAME trained VAE — isolates
        # the flow model's contribution (decode path is identical).
        random_params = {"flux": pipe.params["flux"],
                         "controlnet": pipe.params["controlnet"]}

        print(f"[3/4] joint FLUX+CN training ({args.steps_flux} steps)...",
              flush=True)
        judge_params = None
        if args.ocr_loss_weight > 0.0:
            from reptext_tpu.eval.ocr import load_judge

            judge_params = load_judge()
        trained = train_flow(pipe, batch, args.steps_flux,
                             seed=args.train_seed,
                             ocr_loss_weight=args.ocr_loss_weight,
                             judge_params=judge_params)
        if args.params_cache:
            save_pipeline_params(
                {"vae": pipe.params["vae"], **trained}, args.params_cache
            )
            print(f"      saved trained params to {args.params_cache}",
                  flush=True)

    print("[4/4] sampling + scoring (trained vs random)...", flush=True)
    try:
        from reptext_tpu.eval import ocr as ocr_judge

        judge = ocr_judge.load_judge_ensemble()
    except FileNotFoundError:
        judge = None
        print("      (no OCR judge weights; char accuracy skipped)")

    pipe.params.update(trained)
    res_trained = sample_and_score(pipe, samples, batch, args.steps_sample, judge)
    res_holdout = (sample_and_score(pipe, holdout_samples, batch,
                                    args.steps_sample, judge)
                   if holdout_samples is not None else None)
    pipe.params.update(random_params)
    res_random = sample_and_score(pipe, samples, batch, args.steps_sample, judge)

    out = {
        "protocol": ("held-out generalization, train K=%d / eval %d unseen "
                     "words, %d^2, %d sample steps"
                     % (len(samples), len(holdout_samples), args.size,
                        args.steps_sample)) if args.holdout else
                    ("overfit-memorization, K=%d pairs, %d^2, %d sample steps"
                     % (len(samples), args.size, args.steps_sample)),
        "vae_recon_psnr_db": None if psnr is None else round(psnr, 2),
        "train_steps_vae": args.steps_vae,
        "train_steps_flux": args.steps_flux,
        "ocr_loss_weight": args.ocr_loss_weight,
        "train_seed": args.train_seed,
        "char_accuracy_trained": round(res_trained["char_accuracy"], 4),
        "char_accuracy_random": round(res_random["char_accuracy"], 4),
        "mean_edge_iou_trained": round(res_trained["mean_edge_iou"], 4),
        "mean_edge_iou_random": round(res_random["mean_edge_iou"], 4),
        **({"char_accuracy_holdout": round(res_holdout["char_accuracy"], 4),
            "mean_edge_iou_holdout": round(res_holdout["mean_edge_iou"], 4),
            "holdout_words": HOLDOUT_WORDS} if res_holdout is not None else {}),
        "words": train_words,
        "wall_s": round(time.time() - t_start, 1),
        "device": jax.devices()[0].device_kind,
    }
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    Path(args.output).write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))

    try:  # sample grid: row 0 targets, row 1 trained, row 2 random
        from PIL import Image

        rows = [
            np.concatenate([s["target"] for s in samples], axis=1),
            np.concatenate(res_trained["images"], axis=1),
            np.concatenate(res_random["images"], axis=1),
        ]
        grid = np.concatenate(rows, axis=0)
        png = str(Path(args.output).with_suffix(".png"))
        Image.fromarray(grid).save(png)
        print(f"wrote {png}")
    except Exception as e:  # noqa: BLE001
        print(f"grid save skipped: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
