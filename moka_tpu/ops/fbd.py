"""Fast block-diagonal ops (the BOFT butterfly primitive).

Reference: ``VisualText/modified_peft/tuners/boft/fbd/fbd_cuda.cpp`` +
``fbd_cuda_kernel.cu`` — the repo's ONLY native code (SURVEY.md §2.9).  The
CUDA kernel merely scatters (z, N, b, b) blocks into a dense (z, Nb, Nb)
block-diagonal matrix which is then matmul'd.  The TPU-native design skips
the materialization entirely: a block-diagonal product IS a batched
per-block matmul, so

  * ``fast_block_diag``      — API-parity dense materialization (pure XLA,
    the backward is the exact inverse gather like the CUDA backward);
  * ``block_diag_matmul``    — the fused product y = blockdiag(R) @ x as a
    Pallas kernel over (z, block-row) tiles, never forming the Nb x Nb
    matrix (with an einsum fallback for small shapes / CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fast_block_diag(blocks: jax.Array) -> jax.Array:
    """(z, N, b, b) -> (z, N*b, N*b) dense block-diagonal (API parity with
    ``forward_fast_block_diag_cuda``)."""
    z, N, b, _ = blocks.shape
    eye = jnp.eye(N, dtype=blocks.dtype)  # (N, N) selector
    # out[z, i*b+x, j*b+y] = blocks[z, i, x, y] * (i == j)
    out = jnp.einsum("znxy,nm->znxmy", blocks, eye)
    return out.reshape(z, N * b, N * b)


def _bd_kernel(blocks_ref, x_ref, y_ref):
    # blocks_ref: (1, 1, b, b); x_ref: (1, 1, b, m); y_ref: (1, 1, b, m)
    y_ref[0, 0] = jax.lax.dot_general(
        blocks_ref[0, 0], x_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("use_pallas", "interpret"))
def block_diag_matmul(blocks: jax.Array, x: jax.Array,
                      use_pallas: bool = True,
                      interpret: bool = False) -> jax.Array:
    """y[z] = blockdiag(blocks[z]) @ x[z].

    blocks: (z, N, b, b); x: (z, N*b, m) -> (z, N*b, m)."""
    z, N, b, _ = blocks.shape
    m = x.shape[-1]
    xb = x.reshape(z, N, b, m)
    # Pallas pays off when the per-block tile is MXU-sized; otherwise the
    # batched einsum is already optimal.
    if not use_pallas or b % 8 or m % 128 or x.dtype == jnp.float64:
        y = jnp.einsum("znab,znbm->znam", blocks, xb,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return y.reshape(z, N * b, m)
    y = pl.pallas_call(
        _bd_kernel,
        grid=(z, N),
        in_specs=[
            pl.BlockSpec((1, 1, b, b), lambda zi, ni: (zi, ni, 0, 0)),
            pl.BlockSpec((1, 1, b, m), lambda zi, ni: (zi, ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, b, m), lambda zi, ni: (zi, ni, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((z, N, b, m), x.dtype),
        interpret=interpret,
    )(blocks, xb)
    return y.reshape(z, N * b, m)


def butterfly_perm(n: int, stride: int) -> jax.Array:
    """Butterfly permutation indices used by BOFT between factors: gather
    pairs at the given stride (block-butterfly factorization)."""
    idx = jnp.arange(n)
    group = idx // (2 * stride)
    within = idx % (2 * stride)
    # interleave [0..stride) of each half
    half = jnp.where(within < stride, within * 2, (within - stride) * 2 + 1)
    return group * (2 * stride) + half


def cayley(q: jax.Array) -> jax.Array:
    """Skew-symmetrize + Cayley transform -> orthogonal block
    (BOFT's parametrization: R = (I + S)(I - S)^-1 with S = (Q - Q^T)/2)."""
    s = 0.5 * (q - jnp.swapaxes(q, -1, -2))
    eye = jnp.eye(q.shape[-1], dtype=q.dtype)
    return jnp.linalg.solve(eye - s, eye + s)
