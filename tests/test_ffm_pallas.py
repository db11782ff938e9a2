"""Pallas fused FFM kernel == XLA formulation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ftrl_ffm_tpu.ops.ffm_pallas import ffm_fused_logits_grads
from ftrl_ffm_tpu.ops.interactions import ffm_logits_and_grads


@pytest.mark.parametrize("b,f,c,k", [(16, 5, 4, 8), (32, 39, 39, 16)])
def test_fused_kernel_matches_xla(b, f, c, k):
    rng = np.random.default_rng(0)
    e = c * k
    v = jnp.asarray(rng.normal(size=(b, f, e)).astype(np.float32) * 0.1)
    fields = jnp.asarray(rng.integers(0, c, (b, f)).astype(np.int32))
    vals = jnp.asarray(rng.random((b, f)).astype(np.float32))
    lin = jnp.asarray(rng.normal(size=(b,)).astype(np.float32) * 0.1)
    y = jnp.asarray((rng.random(b) > 0.5).astype(np.float32))
    sw = jnp.asarray((rng.random(b) > 0.2).astype(np.float32))  # some padded

    logits_ref, dv = ffm_logits_and_grads(v, fields, vals, lin, c, k, True)
    gs = (jax.nn.sigmoid(logits_ref) - y) * sw
    g_ref = gs[:, None, None] * dv

    logits, gg2 = ffm_fused_logits_grads(
        v.reshape(b * f, e), fields, vals, lin, y, sw, c, k,
        compute_grads=True, block_b=8, interpret=True,
    )
    g = gg2[:, :e].reshape(b, f, e)
    g2 = gg2[:, e:].reshape(b, f, e)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g2), np.asarray(g) ** 2, rtol=1e-6, atol=1e-9
    )


def test_fused_kernel_padding_inert():
    """Padded occurrences (val 0) and padded samples (sw 0) give zero grads."""
    b, f, c, k = 8, 4, 3, 4
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(b, f, c * k)).astype(np.float32))
    fields = jnp.zeros((b, f), jnp.int32)
    vals = jnp.zeros((b, f), jnp.float32)  # all padding occurrences
    lin = jnp.zeros((b,), jnp.float32)
    y = jnp.ones((b,), jnp.float32)
    sw = jnp.zeros((b,), jnp.float32)      # all samples padded
    logits, gg2 = ffm_fused_logits_grads(
        v.reshape(b, -1).reshape(b * f, c * k), fields, vals, lin, y, sw, c, k,
        block_b=8, interpret=True,
    )
    assert float(jnp.abs(gg2).sum()) == 0.0
    np.testing.assert_allclose(np.asarray(logits), 0.0, atol=1e-7)


def test_inference_kernel_matches_xla():
    from ftrl_ffm_tpu.ops.ffm_pallas import ffm_fused_logits

    b, f, c, k = 16, 5, 4, 8
    rng = np.random.default_rng(4)
    e = c * k
    v = jnp.asarray(rng.normal(size=(b, f, e)).astype(np.float32) * 0.1)
    fields = jnp.asarray(rng.integers(0, c, (b, f)).astype(np.int32))
    vals = jnp.asarray(rng.random((b, f)).astype(np.float32))
    lin = jnp.asarray(rng.normal(size=(b,)).astype(np.float32) * 0.1)
    ref, _ = ffm_logits_and_grads(v, fields, vals, lin, c, k, False)
    got = ffm_fused_logits(
        v.reshape(b * f, e), fields, vals, lin, c, k, block_b=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)
