"""FLUX.1 MMDiT diffusion transformer (Flax, scan-over-layers).

The reference imports this model from diffusers (`FluxTransformer2DModel`,
invoked at RepText/pipeline_flux_controlnet.py:1092-1104). This is a TPU-first
reimplementation:

- Layers run under ``nn.scan`` with stacked parameters: constant-size XLA graph
  (compile time independent of depth) and a single fused while-loop on device.
- ControlNet residual injection is an optional scanned input: per-double-block
  residuals added to the image stream, per-single-block residuals added to the
  image-token slice, matching diffusers' injection points including the
  ceil-interval index mapping for depth-mismatched ControlNets.
- Timestep semantics: callers pass sigma-scaled t in [0, 1]; the model embeds
  t*1000 (reference behavior, RepText/controlnet_flux.py:282,
  RepText/pipeline_flux_controlnet.py:1048).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from reptext_tpu.configs import FluxConfig
from reptext_tpu.io.quantize import dequantize_collection
from reptext_tpu.nn.blocks import JointTransformerBlock, SingleTransformerBlock
from reptext_tpu.nn.embeddings import CombinedTimestepTextEmbed
from reptext_tpu.nn.layers import AdaLayerNormContinuous
from reptext_tpu.ops.rope import rope_cos_sin_half

Dtype = Any


class _DoubleLayer(nn.Module):
    config: FluxConfig
    attention_backend: Optional[str]
    dtype: Dtype
    param_dtype: Dtype
    ip_adapter: bool = False

    @nn.compact
    def __call__(self, carry, inject):
        if self.ip_adapter:
            ctx, x, temb, cos, sin, ip_tokens, ip_scale = carry
        else:
            ctx, x, temb, cos, sin = carry
            ip_tokens = ip_scale = None
        ctx, x = JointTransformerBlock(
            dim=self.config.inner_dim,
            num_heads=self.config.num_attention_heads,
            head_dim=self.config.attention_head_dim,
            mlp_ratio=self.config.mlp_ratio,
            attention_backend=self.attention_backend,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            ip_adapter=self.ip_adapter,
            name="block",
        )(x, ctx, temb, cos, sin, ip_tokens, ip_scale)
        # diffusers adds the ControlNet residual to the block's OUTPUT
        # (after-block injection: `hidden_states = hidden_states +
        # controlnet_block_samples[index_block // interval]` in
        # FluxTransformer2DModel.forward, invoked at
        # RepText/pipeline_flux_controlnet.py:1092-1104)
        if inject is not None:
            x = x + inject.astype(x.dtype)
        if self.ip_adapter:
            return (ctx, x, temb, cos, sin, ip_tokens, ip_scale), None
        return (ctx, x, temb, cos, sin), None


class _SingleLayer(nn.Module):
    config: FluxConfig
    txt_len: int
    attention_backend: Optional[str]
    dtype: Dtype
    param_dtype: Dtype

    @nn.compact
    def __call__(self, carry, inject):
        x, temb, cos, sin = carry
        x = SingleTransformerBlock(
            dim=self.config.inner_dim,
            num_heads=self.config.num_attention_heads,
            head_dim=self.config.attention_head_dim,
            mlp_ratio=self.config.mlp_ratio,
            attention_backend=self.attention_backend,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            txt_len=self.txt_len,
            name="block",
        )(x, temb, cos, sin)
        # after-block injection into the image-token slice, matching
        # diffusers' single-stream residual add (see _DoubleLayer note)
        if inject is not None:
            x = x.at[:, self.txt_len:, :].add(inject.astype(x.dtype))
        return (x, temb, cos, sin), None


def _spread_residuals(samples: jax.Array, num_layers: int) -> jax.Array:
    """Map [n, ...] ControlNet residuals onto [num_layers, ...] injection slots.

    diffusers indexes residuals as ``samples[i // ceil(L/n)]`` when the
    ControlNet is shallower than the base model; reproduced here as a static
    gather so the scan sees one stacked array.
    """
    n = samples.shape[0]
    if n == num_layers:
        return samples
    interval = int(math.ceil(num_layers / n))
    idx = jnp.asarray([min(i // interval, n - 1) for i in range(num_layers)])
    return samples[idx]


class FluxTransformer2D(nn.Module):
    """The base FLUX diffusion transformer.

    Call signature mirrors the reference model surface
    (RepText/pipeline_flux_controlnet.py:1092-1104): packed latents, T5 context,
    CLIP pooled projection, sigma-timestep, RoPE ids, optional guidance, and
    optional ControlNet residual stacks.
    """

    config: FluxConfig
    attention_backend: Optional[str] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    # rematerialize block activations in the backward pass (training memory;
    # the reference ControlNet's gradient checkpointing equivalent,
    # RepText/controlnet_flux.py:321-340)
    remat: bool = False
    # IP-Adapter image-prompt support: every double block gains to_k_ip /
    # to_v_ip projections (nn/blocks.py JointTransformerBlock.ip_adapter).
    # Single blocks are untouched (diffusers FLUX IP-Adapter behavior;
    # reference compatibility claim: RepText/README.md:183).
    ip_adapter: bool = False
    # fp8 weight-only storage (io/quantize.py): apply with params whose block
    # stacks hold kernel_q8/kernel_scale pairs; each scan iteration
    # dequantizes ONE layer slice to bf16 (nn.map_variables inside the scan),
    # so full FLUX.1-dev (24 GB bf16) runs resident on a 16 GB chip at 12 GB.
    # Apply-time only: init() with weight_quant=False, then
    # io.quantize.quantize_params.
    weight_quant: bool = False

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,            # [B, S_img, in_channels]
        encoder_hidden_states: jax.Array,    # [B, S_txt, joint_attention_dim]
        pooled_projections: jax.Array,       # [B, pooled_projection_dim]
        timestep: jax.Array,                 # [B] in [0, 1]
        img_ids: jax.Array,                  # [S_img, 3]
        txt_ids: jax.Array,                  # [S_txt, 3]
        guidance: Optional[jax.Array] = None,          # [B]
        controlnet_block_samples: Optional[jax.Array] = None,         # [n, B, S_img, D]
        controlnet_single_block_samples: Optional[jax.Array] = None,  # [n, B, S_img, D]
        ip_tokens: Optional[jax.Array] = None,   # [B, N_ip, cross_dim]
        ip_scale: Optional[jax.Array] = None,    # scalar
    ) -> jax.Array:
        cfg = self.config
        dense = lambda feat, name: nn.Dense(  # noqa: E731
            feat, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )

        x = dense(cfg.inner_dim, "x_embedder")(hidden_states)
        temb = CombinedTimestepTextEmbed(
            inner_dim=cfg.inner_dim,
            time_embed_dim=cfg.time_embed_dim,
            guidance_embeds=cfg.guidance_embeds,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="time_text_embed",
        )(timestep, pooled_projections, guidance)
        ctx = dense(cfg.inner_dim, "context_embedder")(encoder_hidden_states)

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        cos, sin = rope_cos_sin_half(ids, cfg.axes_dims_rope, cfg.rope_theta)

        double_inject = None
        if controlnet_block_samples is not None:
            double_inject = _spread_residuals(controlnet_block_samples, cfg.num_layers)
        single_inject = None
        if controlnet_single_block_samples is not None:
            single_inject = _spread_residuals(
                controlnet_single_block_samples, cfg.num_single_layers
            )

        double_layer = nn.remat(_DoubleLayer, prevent_cse=False) if self.remat else _DoubleLayer
        if self.weight_quant:
            double_layer = nn.map_variables(
                double_layer, "params", trans_in_fn=dequantize_collection
            )
        DoubleScan = nn.scan(
            double_layer,
            variable_axes={"params": 0, "intermediates": 0},
            split_rngs={"params": True},
            length=cfg.num_layers,
            in_axes=0,
            out_axes=0,
        )
        if self.ip_adapter:
            if ip_tokens is None:
                raise ValueError("ip_adapter model requires ip_tokens")
            scale = jnp.asarray(1.0 if ip_scale is None else ip_scale, jnp.float32)
            double_carry = (ctx, x, temb, cos, sin,
                            ip_tokens.astype(self.dtype), scale)
        else:
            double_carry = (ctx, x, temb, cos, sin)
        double_carry, _ = DoubleScan(
            config=cfg,
            attention_backend=self.attention_backend,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            ip_adapter=self.ip_adapter,
            name="double_blocks",
        )(double_carry, double_inject)
        ctx, x = double_carry[0], double_carry[1]

        joint = jnp.concatenate([ctx, x], axis=1)
        txt_len = encoder_hidden_states.shape[1]

        single_layer = nn.remat(_SingleLayer, prevent_cse=False) if self.remat else _SingleLayer
        if self.weight_quant:
            single_layer = nn.map_variables(
                single_layer, "params", trans_in_fn=dequantize_collection
            )
        SingleScan = nn.scan(
            single_layer,
            variable_axes={"params": 0, "intermediates": 0},
            split_rngs={"params": True},
            length=cfg.num_single_layers,
            in_axes=0,
            out_axes=0,
        )
        (joint, _, _, _), _ = SingleScan(
            config=cfg,
            txt_len=txt_len,
            attention_backend=self.attention_backend,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="single_blocks",
        )((joint, temb, cos, sin), single_inject)

        x = joint[:, txt_len:, :]
        x = AdaLayerNormContinuous(
            cfg.inner_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="norm_out"
        )(x, temb)
        return dense(cfg.out_channels, "proj_out")(x)
