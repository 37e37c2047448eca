"""Inpaint pipeline tests: dual ControlNet + CFG at tiny config."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from reptext_tpu.configs import (
    CLIPConfig,
    ControlNetConfig,
    FluxConfig,
    PipelineConfig,
    T5Config,
    VAEConfig,
)
from reptext_tpu.conditioning import TextLine, build_conditions
from reptext_tpu.pipelines import FluxRepTextInpaintPipeline

H = W = 64


@pytest.fixture(scope="module")
def pipeline():
    pipe_cfg = PipelineConfig(
        height=H, width=W, num_inference_steps=2, controlnet_conditioning_step=1,
        true_guidance_scale=3.0,
    )
    inpaint_cfg = dataclasses.replace(
        ControlNetConfig().tiny(), extra_condition_channels=4
    )
    return FluxRepTextInpaintPipeline.create_inpaint(
        inpaint_cn_cfg=inpaint_cfg,
        flux_cfg=FluxConfig().tiny(),
        cn_cfg=ControlNetConfig().tiny(),
        vae_cfg=VAEConfig().tiny(),
        pipe_cfg=pipe_cfg,
        clip_cfg=CLIPConfig().tiny(),
        t5_cfg=T5Config().tiny(),
    )


def test_inpaint_end_to_end(pipeline):
    conds = build_conditions([TextLine("X", (20, 20), font_size=24)], W, H)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (H, W, 3), np.uint8)
    mask = np.zeros((H, W), np.uint8)
    mask[16:48, 16:48] = 255

    clip_ids = jnp.asarray([[3, 7, 255, 0, 0, 0, 0, 0]], jnp.int32)
    t5_ids = jnp.asarray([[5, 9, 1, 0, 0, 0]], jnp.int32)
    neg_clip = jnp.asarray([[2, 255, 0, 0, 0, 0, 0, 0]], jnp.int32)
    neg_t5 = jnp.asarray([[4, 1, 0, 0, 0, 0]], jnp.int32)

    out = pipeline(
        conds, image=image, mask=mask,
        clip_ids=clip_ids, t5_ids=t5_ids,
        negative_clip_ids=neg_clip, negative_t5_ids=neg_t5,
        seed=42,
    )
    assert out.shape == (1, H, W, 3)
    assert out.dtype == np.uint8


def test_inpaint_cond_shape(pipeline):
    import jax

    rng = np.random.default_rng(1)
    image = rng.integers(0, 255, (H, W, 3), np.uint8)
    mask = np.zeros((H, W), np.float32)
    mask[:32] = 1.0
    cond = pipeline.prepare_inpaint_cond(image, mask, jax.random.PRNGKey(0))
    # 17 channels * 2x2 patch = 68 features per token; 8x8 latent -> 16 tokens
    assert cond.shape == (1, 16, 68)


def test_inpaint_requires_image_and_mask(pipeline):
    conds = build_conditions([TextLine("X", (20, 20), font_size=24)], W, H)
    with pytest.raises(ValueError):
        pipeline(conds)
