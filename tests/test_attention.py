"""Attention backends: XLA reference vs Pallas kernel (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reptext_tpu.ops.attention import xla_attention
from reptext_tpu.ops.flash_attention import flash_attention


def _qkv(b=1, h=2, s=128, d=32, seed=0, dtype=jnp.float32):
    r = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(r.standard_normal((b, h, s, d)), dtype)  # noqa: E731
    return mk(), mk(), mk()


def test_xla_attention_matches_naive_softmax():
    q, k, v = _qkv(s=16, d=8)
    out = np.asarray(xla_attention(q, k, v))
    logits = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) / np.sqrt(8)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", probs, np.asarray(v))
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("s", [128, 256, 384])
def test_flash_matches_xla_aligned(s):
    q, k, v = _qkv(b=1, h=2, s=s, d=32, seed=s)
    want = np.asarray(xla_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, block_q=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_flash_unaligned_seq_len():
    # 200 is not a multiple of 128: exercises padding + key masking
    q, k, v = _qkv(b=2, h=2, s=200, d=32, seed=7)
    want = np.asarray(xla_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, block_q=128, interpret=True))
    assert got.shape == (2, 2, 200, 32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("backward", ["pallas", "einsum"])
def test_flash_gradients_match_xla(backward):
    q, k, v = _qkv(b=1, h=2, s=128, d=32, seed=11)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, 128, True, backward) ** 2).sum()

    def loss_xla(q, k, v):
        return (xla_attention(q, k, v) ** 2).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=1e-3, atol=1e-3)


def test_flash_pallas_backward_unaligned_matches_einsum_backward():
    # 200 is not a multiple of 128: exercises padding + key masking in both
    # backward kernels (dQ and dK/dV)
    q, k, v = _qkv(b=2, h=2, s=200, d=32, seed=13)

    def loss(q, k, v, backward):
        return (flash_attention(q, k, v, 128, True, backward) * 0.1).sum()

    g_pallas = jax.grad(functools.partial(loss, backward="pallas"),
                        argnums=(0, 1, 2))(q, k, v)
    g_einsum = jax.grad(functools.partial(loss, backward="einsum"),
                        argnums=(0, 1, 2))(q, k, v)
    for gp, ge in zip(g_pallas, g_einsum):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(ge),
                                   rtol=1e-4, atol=1e-5)


def test_flash_lse_stats():
    # forward must emit per-row logsumexp for the backward
    from reptext_tpu.ops.flash_attention import _flash_attention_impl
    q, k, v = _qkv(b=1, h=2, s=200, d=32, seed=17)
    _, lse = _flash_attention_impl(q, k, v, block_q=128, interpret=True)
    logits = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) / np.sqrt(32)
    want = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) + \
        logits.max(-1)
    assert lse.shape == (1, 2, 200)
    # fp32 exp+sum over 200 terms: reduction order differs between the fused
    # kernel graph and the numpy reference -> ~1e-4 absolute on values ~6
    np.testing.assert_allclose(np.asarray(lse), want, rtol=5e-5, atol=2e-4)


def test_streaming_flash_matches_xla():
    from reptext_tpu.ops.flash_attention import _streaming_flash
    q, k, v = _qkv(b=1, h=2, s=200, d=32, seed=21)
    want = np.asarray(xla_attention(q, k, v))
    got, _lse = _streaming_flash(q, k, v, block_q=128, block_kv=128,
                                 interpret=True)
    got = np.asarray(got)
    assert got.shape == (1, 2, 200, 32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_streaming_dispatch_threshold():
    # the impl must route long sequences to the streaming kernel
    from reptext_tpu.ops import flash_attention as fa
    assert fa._SINGLE_PASS_MAX_SEQ < 9216


def test_flash_bf16():
    q, k, v = _qkv(b=1, h=1, s=128, d=32, seed=9, dtype=jnp.bfloat16)
    want = np.asarray(xla_attention(q, k, v)).astype(np.float32)
    got = np.asarray(flash_attention(q, k, v, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_flash_attention_rope_fused_matches_unfused():
    """RoPE-fused kernel (half-split) == XLA rotation + plain kernel."""
    from reptext_tpu.ops.flash_attention import flash_attention_rope
    from reptext_tpu.ops.rope import apply_rope_half, rope_cos_sin_half

    r = np.random.default_rng(7)
    b, h, s, d = 1, 2, 1536, 64   # 1536 % 384 == 0 -> chunked fused path
    q = jnp.asarray(r.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((b, h, s, d)), jnp.float32)
    ids = np.zeros((s, 3), np.float32)
    ids[:, 1] = np.arange(s) % 37
    ids[:, 2] = np.arange(s) % 11
    cos_h, sin_h = rope_cos_sin_half(jnp.asarray(ids), (16, 24, 24))

    got = np.asarray(flash_attention_rope(q, k, v, cos_h, sin_h, 512, True))
    q_rot = apply_rope_half(q, cos_h, sin_h)
    k_rot = apply_rope_half(k, cos_h, sin_h)
    want = np.asarray(xla_attention(q_rot, k_rot, v))
    # bf16 in-kernel tables: tolerance matches bf16 representation error
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_flash_attention_rope_gradients():
    """Fused-rope VJP (rotate-backward adjoint) == autodiff through the
    unfused composition."""
    from reptext_tpu.ops.flash_attention import flash_attention_rope
    from reptext_tpu.ops.rope import apply_rope_half, rope_cos_sin_half

    r = np.random.default_rng(8)
    b, h, s, d = 1, 2, 128, 32    # tiny -> falls back to XLA rotate + kernel
    q = jnp.asarray(r.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((b, h, s, d)), jnp.float32)
    ids = np.asarray(r.integers(0, 9, (s, 3)), np.float32)
    cos_h, sin_h = rope_cos_sin_half(jnp.asarray(ids), (8, 12, 12))

    def fused(q, k, v):
        return jnp.sum(flash_attention_rope(q, k, v, cos_h, sin_h, 128, True,
                                            "einsum") ** 2)

    def unfused(q, k, v):
        qr = apply_rope_half(q, cos_h, sin_h)
        kr = apply_rope_half(k, cos_h, sin_h)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qr, kr) / np.sqrt(d)
        return jnp.sum((jax.nn.softmax(logits, -1) @ v) ** 2)

    g_fused = jax.grad(fused, argnums=(0, 1, 2))(q, k, v)
    g_unfused = jax.grad(unfused, argnums=(0, 1, 2))(q, k, v)
    for gf, gu in zip(g_fused, g_unfused):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gu),
                                   rtol=1e-4, atol=1e-5)


def test_flash_attention_rope_streaming_path():
    """Long sequences route to the rope-fused streaming kernel; must match
    XLA rotation + reference softmax."""
    from unittest import mock

    import reptext_tpu.ops.flash_attention as fa
    from reptext_tpu.ops.rope import apply_rope_half, rope_cos_sin_half

    r = np.random.default_rng(9)
    b, h, s, d = 1, 1, 640, 32
    q = jnp.asarray(r.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((b, h, s, d)), jnp.float32)
    ids = np.zeros((s, 3), np.float32)
    ids[:, 1] = np.arange(s) % 23
    cos_h, sin_h = rope_cos_sin_half(jnp.asarray(ids), (8, 12, 12))

    with mock.patch.object(fa, "_SINGLE_PASS_MAX_SEQ", 256):  # force streaming
        got = np.asarray(
            fa.flash_attention_rope(q, k, v, cos_h, sin_h, 128, True))
    q_rot = apply_rope_half(q, cos_h, sin_h)
    k_rot = apply_rope_half(k, cos_h, sin_h)
    want = np.asarray(xla_attention(q_rot, k_rot, v))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_flash_attention_rope_pallas_backward():
    """Rope-fused VJP with the Pallas streaming backward == einsum backward
    (chunked fused-rope forward path: S % 384 == 0, S >= 1152)."""
    from reptext_tpu.ops.flash_attention import flash_attention_rope
    from reptext_tpu.ops.rope import rope_cos_sin_half

    r = np.random.default_rng(11)
    b, h, s, d = 1, 1, 1152, 32
    q = jnp.asarray(r.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((b, h, s, d)), jnp.float32)
    ids = np.asarray(r.integers(0, 31, (s, 3)), np.float32)
    cos_h, sin_h = rope_cos_sin_half(jnp.asarray(ids), (8, 12, 12))

    def loss(backward):
        def f(q, k, v):
            return jnp.sum(
                flash_attention_rope(q, k, v, cos_h, sin_h, 384, True,
                                     backward) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g_pallas = loss("pallas")
    g_einsum = loss("einsum")
    for gp, ge in zip(g_pallas, g_einsum):
        # fused forward uses bf16 in-kernel tables -> bf16-order tolerance
        np.testing.assert_allclose(np.asarray(gp), np.asarray(ge),
                                   rtol=5e-2, atol=5e-2)


# --- clamped max-free softmax semantics (round 5) --------------------------


def _planted_logit_qkv(peak: float, s=256, d=32):
    """q/k engineered so row 0's logits span [-peak, peak] exactly."""
    r = np.random.default_rng(3)
    q = np.zeros((1, 1, s, d), np.float32)
    k = np.zeros((1, 1, s, d), np.float32)
    q[0, 0, :, 0] = peak * np.sqrt(d)          # scale folds in 1/sqrt(d)
    k[0, 0, :, 0] = np.linspace(-1.0, 1.0, s)  # logits = peak*linspace
    v = r.standard_normal((1, 1, s, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_clamped_softmax_exact_inside_bound():
    # |logits| up to 40 < _LOGIT_CLAMP: the max-free kernel must agree with
    # the true softmax even though exp(40) = 2.4e17 (no running max).
    from reptext_tpu.ops import flash_attention as fa
    assert fa._softmax_mode() == "clamped"  # the default
    q, k, v = _planted_logit_qkv(peak=40.0)
    want = np.asarray(xla_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, block_q=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_clamped_softmax_beyond_bound_is_clipped_softmax():
    # |logits| beyond the clamp: the kernel computes softmax of the CLIPPED
    # logits (documented deviation; QK-normed models never reach it).
    from reptext_tpu.ops import flash_attention as fa
    q, k, v = _planted_logit_qkv(peak=80.0)
    clipped = np.clip(
        np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k))
        / np.sqrt(q.shape[-1]),
        -fa._LOGIT_CLAMP, fa._LOGIT_CLAMP,
    )
    p = np.exp(clipped - clipped.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v))
    got = np.asarray(flash_attention(q, k, v, block_q=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # ... and is NOT the unclipped softmax (the test would be vacuous)
    raw = np.asarray(xla_attention(q, k, v))
    assert np.abs(raw - got).max() > 1e-3


def test_online_mode_matches_clamped(monkeypatch):
    from reptext_tpu.ops import flash_attention as fa
    q, k, v = _qkv(s=200, seed=31)
    got_clamped = np.asarray(flash_attention(q, k, v, interpret=True))
    monkeypatch.setenv("REPTEXT_SOFTMAX", "online")
    assert fa._softmax_mode() == "online"
    got_online = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got_clamped, got_online, rtol=1e-5, atol=1e-5)


def test_clamped_streaming_and_grads_consistent():
    # streaming fwd + pallas bwd both run the clamped path; grads must match
    # the einsum oracle at normal logit scales.
    from reptext_tpu.ops.flash_attention import _streaming_flash
    q, k, v = _qkv(s=200, seed=37)
    want = np.asarray(xla_attention(q, k, v))
    got, _ = _streaming_flash(q, k, v, block_q=128, block_kv=128,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    fn_p = lambda *a: flash_attention(*a, 128, True, "pallas").sum()  # noqa: E731
    fn_e = lambda *a: flash_attention(*a, 128, True, "einsum").sum()  # noqa: E731
    gp = jax.grad(fn_p, argnums=(0, 1, 2))(q, k, v)
    ge = jax.grad(fn_e, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
