"""FlowMatch Euler discrete schedule (FLUX flavor) with dynamic time shifting.

Reference semantics (all verified against RepText/pipeline_flux_controlnet.py):
- sigmas = linspace(1.0, 1/N, N), then exponential mu-shift, with a trailing 0
  (":947-967" + diffusers FlowMatchEulerDiscreteScheduler.set_timesteps).
- dynamic shift: mu = calculate_shift(image_seq_len, 256->0.5, 4096->1.16)
  (":78-88").
- step: x_{i+1} = x_i + (sigma_{i+1} - sigma_i) * v  (Euler over the rectified
  flow ODE; diffusers scheduler.step invoked at ":1109").
- models receive timestep = t/1000 and re-scale x1000 internally (":1048",
  RepText/controlnet_flux.py:282); here the schedule stores ``timesteps`` in the
  0..1000 range and callers divide before feeding models.

Everything is a pure function of static config so the whole schedule can be
baked into a single jitted sampling graph as constant arrays.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


def calculate_shift(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.16,
) -> float:
    """Linear interpolation of the log-shift mu in image sequence length."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def time_shift(mu: float, sigma: float, t: np.ndarray) -> np.ndarray:
    """Exponential time shift: t -> e^mu / (e^mu + (1/t - 1)^sigma)."""
    return math.exp(mu) / (math.exp(mu) + (1 / t - 1) ** sigma)


@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    """Precomputed schedule arrays (host numpy; converted to jnp at trace time).

    sigmas has length N+1 (trailing 0.0); timesteps has length N and equals
    sigmas[:-1] * 1000.
    """

    sigmas: np.ndarray
    timesteps: np.ndarray

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    def step(self, latents: jax.Array, velocity: jax.Array, i) -> jax.Array:
        """One Euler step; ``i`` may be a traced int32 index (for lax.scan)."""
        sig = jnp.asarray(self.sigmas, dtype=jnp.float32)
        dt = sig[i + 1] - sig[i]
        # diffusers upcasts latents to float32 inside step and keeps them there
        return latents.astype(jnp.float32) + dt * velocity.astype(jnp.float32)

    def scale_noise(self, sample: jax.Array, noise: jax.Array, i: int) -> jax.Array:
        """Forward process at step i: sigma*noise + (1-sigma)*sample."""
        sigma = float(self.sigmas[i])
        return sigma * noise + (1.0 - sigma) * sample


def build_schedule(
    num_steps: int,
    image_seq_len: int,
    base_image_seq_len: int = 256,
    max_image_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.16,
    use_dynamic_shifting: bool = True,
    shift: float = 3.0,
    timesteps=None,
    sigmas=None,
) -> FlowMatchSchedule:
    """Build the FLUX FlowMatch Euler schedule.

    With dynamic shifting (FLUX.1-dev default), sigmas are exponentially shifted
    by mu from :func:`calculate_shift`; otherwise the static ``shift`` factor is
    applied as sigma' = shift*sigma / (1 + (shift-1)*sigma).

    Custom schedules (at most one of the two; reference ``retrieve_timesteps``,
    RepText/pipeline_flux_controlnet.py:91-160, forwarding into the scheduler's
    ``set_timesteps(timesteps=..., sigmas=..., mu=...)``):

    - ``sigmas``: caller-provided base sigma ladder replacing the linspace;
      the shift is still applied, and the model-facing timesteps are derived
      as ``shifted_sigma * 1000``.
    - ``timesteps``: caller-provided model-facing timesteps (0..1000 range,
      e.g. a distillation sampler's trained grid). The Euler step sigmas are
      derived by shifting ``t/1000``, but the stored ``timesteps`` stay the
      caller's values VERBATIM — the scheduler's documented behavior
      (``is_timesteps_provided`` branch): the model is conditioned on the grid
      it was distilled for while integration follows the shifted ladder.

    Both override ``num_steps`` with their own length.
    """
    if timesteps is not None and sigmas is not None:
        # reference retrieve_timesteps raises the same way (":138-139")
        raise ValueError(
            "Only one of `timesteps` or `sigmas` can be passed. "
            "Please choose one to set custom values"
        )
    provided_timesteps = None
    if timesteps is not None:
        provided_timesteps = np.asarray(timesteps, dtype=np.float64)
        if provided_timesteps.ndim != 1 or len(provided_timesteps) == 0:
            raise ValueError("timesteps must be a non-empty 1D sequence")
        if (provided_timesteps <= 0).any() or (provided_timesteps > 1000).any():
            raise ValueError("timesteps must lie in (0, 1000]")
        base = provided_timesteps / 1000.0
    elif sigmas is not None:
        base = np.asarray(sigmas, dtype=np.float64)
        if base.ndim != 1 or len(base) == 0:
            raise ValueError("sigmas must be a non-empty 1D sequence")
        if (base <= 0).any() or (base > 1).any():
            raise ValueError("sigmas must lie in (0, 1]")
    else:
        base = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    if use_dynamic_shifting:
        mu = calculate_shift(
            image_seq_len, base_image_seq_len, max_image_seq_len, base_shift, max_shift
        )
        shifted = np.array([time_shift(mu, 1.0, s) for s in base])
    else:
        shifted = shift * base / (1 + (shift - 1) * base)
    if provided_timesteps is not None:
        out_timesteps = provided_timesteps.astype(np.float32)
    else:
        out_timesteps = (shifted * 1000.0).astype(np.float32)
    out_sigmas = np.concatenate([shifted, [0.0]]).astype(np.float32)
    return FlowMatchSchedule(sigmas=out_sigmas, timesteps=out_timesteps)
