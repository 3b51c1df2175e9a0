"""Fused lm_head+CE Pallas kernel vs the XLA reference: loss and dX
parity with an int8 head, ignored targets, ragged rows and vocab."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moka_tpu.ops.fused_ce import fused_ce_loss
from moka_tpu.ops.quant import quantize_int8


def _ref_loss(h, lm_head_q, targets, ignore_index=-100):
    w = lm_head_q["w_i8"].astype(jnp.float32) * lm_head_q["scale"]
    logits = h.astype(jnp.float32) @ w.astype(jnp.float32)
    valid = targets != ignore_index
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)


@pytest.mark.parametrize("rows,vocab", [(64, 256), (50, 203), (128, 512)])
def test_fused_ce_matches_reference(rows, vocab):
    """Loss parity incl. row padding (50 -> 64) and vocab padding
    (203 -> 256 phantom -inf columns)."""
    rng = np.random.default_rng(0)
    d = 64
    h = jnp.asarray(rng.standard_normal((rows, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, vocab)), jnp.float32)
    wq = quantize_int8(w, axis=-2)
    t = rng.integers(0, vocab, rows)
    t[::7] = -100  # ignored rows sprinkled in
    t = jnp.asarray(t, jnp.int32)

    want = float(_ref_loss(h, wq, t))
    got = float(fused_ce_loss(h, wq, t, block_r=32, block_v=64,
                              interpret=True))
    # bf16 x in the kernel vs f32 reference: loose-ish tolerance
    np.testing.assert_allclose(got, want, rtol=2e-2)


def test_fused_ce_grad_matches_reference():
    rng = np.random.default_rng(1)
    rows, d, vocab = 48, 64, 203
    h = jnp.asarray(rng.standard_normal((rows, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, vocab)), jnp.float32)
    wq = quantize_int8(w, axis=-2)
    t = rng.integers(0, vocab, rows)
    t[::5] = -100
    t = jnp.asarray(t, jnp.int32)

    g_ref = jax.grad(lambda x: _ref_loss(x, wq, t))(h)
    g_fused = jax.grad(lambda x: fused_ce_loss(
        x, wq, t, block_r=16, block_v=64, interpret=True))(h)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=5e-2, atol=5e-4)
    # ignored rows carry exactly zero gradient
    np.testing.assert_array_equal(np.asarray(g_fused)[::5], 0.0)


def test_fused_ce_all_ignored():
    """count=0 guard: all-ignored batch gives loss 0 and zero grads."""
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    wq = quantize_int8(jnp.asarray(rng.standard_normal((32, 64)),
                                   jnp.float32), axis=-2)
    t = jnp.full((16,), -100, jnp.int32)
    loss, g = jax.value_and_grad(lambda x: fused_ce_loss(
        x, wq, t, block_r=16, block_v=32, interpret=True))(h)
    assert float(loss) == 0.0
    np.testing.assert_array_equal(np.asarray(g), 0.0)
