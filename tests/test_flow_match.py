"""FlowMatch Euler schedule golden-value tests.

Golden mu values computed by hand from the reference's calculate_shift
coefficients (RepText/pipeline_flux_controlnet.py:78-88): m = 0.66/3840,
b = 0.5 - m*256.
"""

import math

import jax.numpy as jnp
import numpy as np

from reptext_tpu.sampling import FlowMatchSchedule, build_schedule, calculate_shift


def test_calculate_shift_golden():
    assert math.isclose(calculate_shift(256), 0.5)
    assert math.isclose(calculate_shift(4096), 1.16)
    m = (1.16 - 0.5) / (4096 - 256)
    assert math.isclose(calculate_shift(1024), 0.5 + m * (1024 - 256))


def test_schedule_shapes_and_endpoints():
    sched = build_schedule(num_steps=30, image_seq_len=4096)
    assert sched.num_steps == 30
    assert len(sched.sigmas) == 31
    assert sched.sigmas[-1] == 0.0
    # first sigma: shift(mu, 1.0) = e^mu/(e^mu + 0) = 1.0
    assert math.isclose(float(sched.sigmas[0]), 1.0, abs_tol=1e-6)
    # timesteps = sigma*1000, decreasing
    np.testing.assert_allclose(sched.timesteps, sched.sigmas[:-1] * 1000, rtol=1e-6)
    assert (np.diff(sched.sigmas) < 0).all()


def test_dynamic_shift_formula():
    mu = calculate_shift(1024)
    sched = build_schedule(num_steps=10, image_seq_len=1024)
    raw = np.linspace(1.0, 0.1, 10)
    want = np.exp(mu) / (np.exp(mu) + (1 / raw - 1))
    np.testing.assert_allclose(sched.sigmas[:-1], want, rtol=1e-5)


def test_static_shift_formula():
    sched = build_schedule(num_steps=4, image_seq_len=0, use_dynamic_shifting=False, shift=3.0)
    raw = np.linspace(1.0, 0.25, 4)
    want = 3.0 * raw / (1 + 2.0 * raw)
    np.testing.assert_allclose(sched.sigmas[:-1], want, rtol=1e-6)


def test_euler_step():
    sched = build_schedule(num_steps=5, image_seq_len=256)
    x = jnp.ones((1, 4))
    v = jnp.full((1, 4), 2.0)
    got = np.asarray(sched.step(x, v, 0))
    dt = sched.sigmas[1] - sched.sigmas[0]
    np.testing.assert_allclose(got, 1.0 + dt * 2.0, rtol=1e-6)


def test_scale_noise_at_step0_is_pure_noise():
    sched = build_schedule(num_steps=8, image_seq_len=256)
    sample = jnp.zeros((2, 2))
    noise = jnp.ones((2, 2))
    out = np.asarray(sched.scale_noise(sample, noise, 0))
    np.testing.assert_allclose(out, float(sched.sigmas[0]), rtol=1e-6)
