"""Fused int8 matmul kernel vs dequantize-then-matmul, values and dx."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moka_tpu.ops.quant import dequantize, quantize_int8
from moka_tpu.ops.w8_matmul import w8_matmul, w8_matmul_2d


def _setup(M=24, K=40, N=48, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.1, jnp.float32)
    qw = quantize_int8(w, axis=0)
    qw = {"w_i8": qw["w_i8"], "scale": qw["scale"].reshape(1, N)}
    return x, w, qw


def test_forward_matches_dequant():
    x, w, qw = _setup()
    want = x @ dequantize(qw, dtype=jnp.float32)
    got = w8_matmul_2d(x, qw["w_i8"], qw["scale"].reshape(-1),
                       8, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-4)


def test_batched_wrapper():
    x, w, qw = _setup()
    xb = x.reshape(2, 12, 40)
    got = w8_matmul(xb, qw, interpret=True)
    want = jnp.einsum("bld,df->blf", xb, dequantize(qw, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-4)


def test_dx_matches_dequant_grad():
    x, w, qw = _setup(seed=1)
    wd = dequantize(qw, dtype=jnp.float32)

    g_ref = jax.grad(lambda x: jnp.sum((x @ wd) ** 2))(x)
    g_ker = jax.grad(lambda x: jnp.sum(
        w8_matmul_2d(x, qw["w_i8"], qw["scale"].reshape(-1),
                     8, 128, 128, True) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               rtol=3e-4, atol=3e-4)


def test_ragged_shapes():
    x, w, qw = _setup(M=13, K=100, N=60, seed=2)
    want = x @ dequantize(qw, dtype=jnp.float32)
    got = w8_matmul_2d(x, qw["w_i8"], qw["scale"].reshape(-1),
                       8, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-4)
