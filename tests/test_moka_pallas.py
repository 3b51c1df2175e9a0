"""Fused MokA Pallas kernel vs the jnp reference op: forward parity (both
flavors, ragged lengths) and exact gradients through the custom VJP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moka_tpu.ops.moka import MokaSpec, moka_delta
from moka_tpu.ops.moka_pallas import moka_delta_fused
from tests.test_moka_op import _make_masks


@pytest.mark.parametrize("flavor", ["avt", "vt"])
def test_fused_forward_parity(flavor):
    rng = np.random.default_rng(0)
    if flavor == "avt":
        spec = MokaSpec.avt(rank=4, lora_alpha=16.0, blc_weight=0.7,
                            dropout_rate=0.0)
        M = 3
    else:
        spec = MokaSpec.vt(rank=4, attn_weight=0.05, dropout_rate=0.0)
        M = 2
    b, L, d_in, d_out = 2, 24, 16, 12
    x = jnp.asarray(rng.standard_normal((b, L, d_in)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((M, d_in, 4)) * 0.1, jnp.float32)
    B = jnp.asarray(rng.standard_normal((4, d_out)) * 0.1, jnp.float32)
    masks, qmask = _make_masks(rng, b, L, M)
    masks, qmask = jnp.asarray(masks), jnp.asarray(qmask)

    want = moka_delta(x, A, B, masks, qmask, spec)
    got = moka_delta_fused(x, A, B, masks, qmask, spec, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5,
                               atol=3e-5)


def test_fused_ragged_block():
    rng = np.random.default_rng(1)
    spec = MokaSpec.avt(rank=4, dropout_rate=0.0)
    b, L, d = 2, 21, 16
    x = jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((3, d, 4)) * 0.1, jnp.float32)
    B = jnp.asarray(rng.standard_normal((4, d)) * 0.1, jnp.float32)
    masks, qmask = _make_masks(rng, b, L, 3)
    want = moka_delta(x, A, B, jnp.asarray(masks), jnp.asarray(qmask), spec)
    got = moka_delta_fused(x, A, B, jnp.asarray(masks), jnp.asarray(qmask),
                           spec, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5,
                               atol=3e-5)


def test_fused_grads_match_reference():
    rng = np.random.default_rng(2)
    spec = MokaSpec.avt(rank=4, dropout_rate=0.0)
    b, L, d = 2, 16, 12
    x = jnp.asarray(rng.standard_normal((b, L, d)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((3, d, 4)) * 0.1, jnp.float32)
    B = jnp.asarray(rng.standard_normal((4, d)) * 0.1, jnp.float32)
    masks, qmask = _make_masks(rng, b, L, 3)
    masks, qmask = jnp.asarray(masks), jnp.asarray(qmask)

    def loss_ref(x, A, B):
        return jnp.sum(moka_delta(x, A, B, masks, qmask, spec) ** 2)

    def loss_fused(x, A, B):
        return jnp.sum(moka_delta_fused(x, A, B, masks, qmask, spec, 8,
                                        True) ** 2)

    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, A, B)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, A, B)
    for a, b_ in zip(g_r, g_f):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=2e-4,
                                   atol=2e-4)
