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
                      bwd_block_q=8, bwd_block_k=8, interpret=True) * vq
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


@pytest.mark.parametrize("bwd_block", [4, 1024])
def test_fully_masked_rows_zero_gradient(bwd_block):
    """ADVICE r1: a valid query row whose entire causal window is masked
    (lse = -inf) must contribute ZERO gradient even when dout is nonzero on
    it — previously exp(s - lse) collapsed to 1 across the block and leaked
    spurious dq/dk/dv."""
    q, k, v, _ = _data(b=1, L=8, S=8, H=2, KH=2)
    mask = np.ones((1, 8), np.int32)
    mask[0, :4] = 0  # queries 0..3 have fully-masked causal windows
    mask_j = jnp.asarray(mask)

    def f(q_, k_, v_):
        out = flash_mha(q_, k_, v_, mask_j, block_q=4, block_k=4,
                        bwd_block_q=bwd_block, bwd_block_k=bwd_block,
                        interpret=True)
        return jnp.sum(out)  # nonzero cotangent on EVERY row incl. masked

    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    # masked-row dq must be exactly zero
    np.testing.assert_array_equal(np.asarray(dq)[0, :4], 0.0)
    # dk/dv: compare against eager grads over valid rows only
    def f_eager(q_, k_, v_):
        bias = causal_bias(mask_j, 8, 8)
        out = mha(q_, k_, v_, bias)
        return jnp.sum(out * jnp.asarray(mask, np.float32)[:, :, None, None])

    def f_flash_valid(q_, k_, v_):
        out = flash_mha(q_, k_, v_, mask_j, block_q=4, block_k=4,
                        bwd_block_q=bwd_block, bwd_block_k=bwd_block,
                        interpret=True)
        return jnp.sum(out * jnp.asarray(mask, np.float32)[:, :, None, None])

    want = jax.grad(f_eager, argnums=(1, 2))(q, k, v)
    got = jax.grad(f_flash_valid, argnums=(1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bwd_block", [8, 16, 1024])
def test_grad_parity_mixed_bwd_blocks(bwd_block):
    """Backward-pair block sizes independent of the forward's (the flagship
    runs fwd 512x512 / bwd 1024x1024 per the on-chip sweep): grads must
    match eager for bwd blocks smaller, equal, and clamped-larger than L,
    including the divisibility fallback on ragged lengths."""
    q, k, v, mask = _data(L=16, S=16)
    vq = jnp.asarray(np.asarray(mask), jnp.float32)[:, :, None, None]

    def loss_eager(q, k, v):
        o = mha(q, k, v, causal_bias(mask, 16, 16)) * vq
        return jnp.sum(o * o)

    def loss_flash(q, k, v):
        o = flash_mha(q, k, v, mask, block_q=8, block_k=8,
                      bwd_block_q=bwd_block, bwd_block_k=bwd_block,
                      interpret=True) * vq
        return jnp.sum(o * o)

    g_e = jax.grad(loss_eager, argnums=(0, 1, 2))(q, k, v)
    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_e, g_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-4,
                                   atol=3e-4)


def test_grad_parity_ragged_bwd_fallback():
    """L=12 with fwd blocks 4 (padded L stays 12) and bwd_block 8: 8 does
    not divide 12, so the bwd pair falls back to the forward blocks —
    grads still match eager."""
    q, k, v, mask = _data(L=12, S=12)
    vq = jnp.asarray(np.asarray(mask), jnp.float32)[:, :, None, None]

    def loss_eager(q, k, v):
        o = mha(q, k, v, causal_bias(mask, 12, 12)) * vq
        return jnp.sum(o * o)

    def loss_flash(q, k, v):
        o = flash_mha(q, k, v, mask, block_q=4, block_k=4,
                      bwd_block_q=8, bwd_block_k=8, interpret=True) * vq
        return jnp.sum(o * o)

    g_e = jax.grad(loss_eager, argnums=(0, 1, 2))(q, k, v)
    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_e, g_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-4,
                                   atol=3e-4)


def test_grad_parity_fused_padded():
    """Fused single-block backward with ragged L (13 -> padded 16): padded
    query rows carry zero cotangent through the slice VJP and must not
    perturb dq/dk/dv."""
    q, k, v, mask = _data(L=13, S=13)
    vq = jnp.asarray(np.asarray(mask), jnp.float32)[:, :, None, None]

    def loss_eager(q, k, v):
        o = mha(q, k, v, causal_bias(mask, 13, 13)) * vq
        return jnp.sum(o * o)

    def loss_flash(q, k, v):
        o = flash_mha(q, k, v, mask, block_q=8, block_k=8,
                      bwd_block_q=1024, bwd_block_k=1024,
                      interpret=True) * vq
        return jnp.sum(o * o)

    g_e = jax.grad(loss_eager, argnums=(0, 1, 2))(q, k, v)
    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_e, g_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-4,
                                   atol=3e-4)


@pytest.mark.parametrize("block", [4, 8])
def test_conditional_masking_parity(block):
    """conditional=True (interior blocks skip the valid/where passes) must
    be bit-equal math to conditional=False — exercised with left padding,
    causal diagonal blocks, and small blocks so interior blocks exist."""
    q, k, v, mask = _data(L=16, S=16)
    base = flash_mha(q, k, v, mask, block_q=block, block_k=block,
                     interpret=True, conditional=False)
    cond = flash_mha(q, k, v, mask, block_q=block, block_k=block,
                     interpret=True, conditional=True)
    _cmp(cond, base, mask, rtol=1e-6, atol=1e-6)

    # grads flow through the same vjp (conditional touches the fwd only)
    def loss(fn_cond):
        def f(q, k, v):
            o = flash_mha(q, k, v, mask, block_q=block, block_k=block,
                          interpret=True, conditional=fn_cond)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        return f
    g1 = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_conditional_masking_q_offset_and_ragged():
    """Prefill-with-cache shape at an offset + a ragged tail (S=20 padded
    to blocks of 8): the tail block must never take the interior branch."""
    q, k, v, mask = _data(L=8, S=20)
    want = flash_mha(q, k, v, mask, q_offset=12, block_q=8, block_k=8,
                     interpret=True, conditional=False)
    got = flash_mha(q, k, v, mask, q_offset=12, block_q=8, block_k=8,
                    interpret=True, conditional=True)
    _cmp(got, want, mask, q_offset=12, rtol=1e-6, atol=1e-6)
