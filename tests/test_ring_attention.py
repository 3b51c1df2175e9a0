"""Ring attention over an 8-way sequence mesh == full causal attention,
forward and gradients."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from moka_tpu.ops.attention import causal_bias, mha
from moka_tpu.parallel.ring_attention import make_ring_attention


def _mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("seq",))


def _data(b=2, L=32, H=4, KH=2, hd=8, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, L, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, L, KH, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, L, KH, hd)), jnp.float32)
    mask = np.ones((b, L), np.int32)
    mask[0, :5] = 0
    return q, k, v, jnp.asarray(mask)


def test_ring_matches_full_forward():
    mesh = _mesh(4)
    q, k, v, mask = _data()
    ring = make_ring_attention(mesh, "seq")
    got = jax.jit(ring)(q, k, v, mask)
    want = mha(q, k, v, causal_bias(mask, q.shape[1], k.shape[1]))
    valid = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(got) * valid,
                               np.asarray(want) * valid, rtol=2e-5,
                               atol=2e-5)


def test_ring_grads_match():
    mesh = _mesh(8)
    q, k, v, mask = _data(L=40, seed=1)
    ring = make_ring_attention(mesh, "seq")
    vq = mask.astype(jnp.float32)[:, :, None, None]

    def loss_ring(q, k, v):
        return jnp.sum((ring(q, k, v, mask) * vq) ** 2)

    def loss_full(q, k, v):
        o = mha(q, k, v, causal_bias(mask, q.shape[1], k.shape[1]))
        return jnp.sum((o * vq) ** 2)

    g_r = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_f = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-4,
                                   atol=3e-4)
