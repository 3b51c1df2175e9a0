"""Chunked fused lm_head+CE must match the materialized path, values and
gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from moka_tpu.models import llama


def test_chunked_ce_matches_full():
    rng = np.random.default_rng(0)
    b, L, d, V = 2, 19, 16, 37
    h = jnp.asarray(rng.standard_normal((b, L, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((d, V)).astype(np.float32) * 0.1)
    labels = rng.integers(0, V, (b, L)).astype(np.int32)
    labels[:, :5] = -100
    labels = jnp.asarray(labels)

    logits = jnp.einsum("bld,dv->blv", h, w)
    want = llama.cross_entropy_loss(logits, labels)
    got = llama.chunked_cross_entropy(h, w, labels, chunk=8)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    g1 = jax.grad(lambda h: llama.cross_entropy_loss(
        jnp.einsum("bld,dv->blv", h, w), labels))(h)
    g2 = jax.grad(lambda h: llama.chunked_cross_entropy(
        h, w, labels, chunk=8))(h)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5,
                               atol=1e-6)


def test_rows_layout_matches_full():
    """rows_layout scans contiguous flattened row blocks (the shift moved
    into the labels) — values AND grads must match the materialized path,
    including ragged b*L % chunk and a quantized head."""
    from moka_tpu.ops.quant import quantize_int8
    rng = np.random.default_rng(1)
    b, L, d, V = 2, 19, 16, 37
    h = jnp.asarray(rng.standard_normal((b, L, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((d, V)).astype(np.float32) * 0.1)
    labels = rng.integers(0, V, (b, L)).astype(np.int32)
    labels[:, :5] = -100
    labels[1, -1] = -100  # ignore at the boundary the shift touches
    labels = jnp.asarray(labels)

    logits = jnp.einsum("bld,dv->blv", h, w)
    want = llama.cross_entropy_loss(logits, labels)
    got = llama.chunked_cross_entropy(h, w, labels, chunk=8,
                                      rows_layout=True)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    g1 = jax.grad(lambda h: llama.cross_entropy_loss(
        jnp.einsum("bld,dv->blv", h, w), labels))(h)
    g2 = jax.grad(lambda h: llama.chunked_cross_entropy(
        h, w, labels, chunk=8, rows_layout=True))(h)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5,
                               atol=1e-6)

    # quantized head path (the flagship recipe's int8 lm_head)
    qw = quantize_int8(w, axis=-2)
    ref = llama.chunked_cross_entropy(h, qw, labels, chunk=8)
    rows = llama.chunked_cross_entropy(h, qw, labels, chunk=8,
                                       rows_layout=True)
    np.testing.assert_allclose(float(rows), float(ref), rtol=1e-6)

    # all-ignored batch must not NaN
    allig = jnp.full((b, L), -100, jnp.int32)
    z = llama.chunked_cross_entropy(h, w, allig, chunk=8, rows_layout=True)
    assert float(z) == 0.0
