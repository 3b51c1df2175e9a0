"""Flash attention vs eager attention: forward and gradients, causal +
padding + GQA + nonzero q_offset (decode), interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moka_tpu.ops.attention import causal_bias, mha
from moka_tpu.ops.flash_attention import flash_mha


def _data(b=2, L=16, S=16, H=4, KH=2, hd=8, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, L, H, hd)).astype(np.float32)
    k = rng.standard_normal((b, S, KH, hd)).astype(np.float32)
    v = rng.standard_normal((b, S, KH, hd)).astype(np.float32)
    mask = np.ones((b, S), np.int32)
    mask[0, :3] = 0  # left padding
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)


def _cmp(got, want, mask, q_offset=0, **kw):
    """Compare only valid (non-pad) query rows — fully-masked rows are
    don't-care (eager softmax over a constant bias != flash uniform)."""
    valid = np.asarray(mask)[:, q_offset:q_offset + got.shape[1]]
    g = np.asarray(got) * valid[:, :, None, None]
    w = np.asarray(want) * valid[:, :, None, None]
    np.testing.assert_allclose(g, w, **kw)


@pytest.mark.parametrize("block", [8, 16])
def test_forward_parity(block):
    q, k, v, mask = _data()
    want = mha(q, k, v, causal_bias(mask, q.shape[1], k.shape[1]))
    got = flash_mha(q, k, v, mask, block_q=block, block_k=block,
                    interpret=True)
    _cmp(got, want, mask, rtol=2e-5, atol=2e-5)


def test_forward_parity_q_offset():
    """Decode-style: 4 queries attending to a 16-slot cache at offset 12."""
    q, k, v, mask = _data(L=4, S=16)
    want = mha(q, k, v, causal_bias(mask, 4, 16, q_offset=12))
    got = flash_mha(q, k, v, mask, q_offset=12, block_q=8, block_k=8,
                    interpret=True)
    _cmp(got, want, mask, q_offset=12, rtol=2e-5, atol=2e-5)


def test_grad_parity():
    q, k, v, mask = _data(L=16, S=16)
    vq = jnp.asarray(np.asarray(mask), jnp.float32)[:, :, None, None]

    def loss_eager(q, k, v):
        o = mha(q, k, v, causal_bias(mask, 16, 16)) * vq
        return jnp.sum(o * o)

    def loss_flash(q, k, v):
        o = flash_mha(q, k, v, mask, block_q=8, block_k=8,
                      interpret=True) * vq
        return jnp.sum(o * o)

    g_e = jax.grad(loss_eager, argnums=(0, 1, 2))(q, k, v)
    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_e, g_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-4,
                                   atol=3e-4)


def test_ragged_lengths():
    """L and S not multiples of the block size."""
    q, k, v, mask = _data(L=13, S=13)
    want = mha(q, k, v, causal_bias(mask, 13, 13))
    got = flash_mha(q, k, v, mask, block_q=8, block_k=8, interpret=True)
    _cmp(got, want, mask, rtol=2e-5, atol=2e-5)
