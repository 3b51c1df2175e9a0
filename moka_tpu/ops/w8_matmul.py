"""Fused int8-weight matmul (Pallas): y = x @ (w_i8 * scale).

The XLA path for the quantized base dequantizes each projection weight into
a full bf16 temporary per use (write + read of the bf16 copy on top of the
int8 read).  This kernel keeps the int8 tile in VMEM, upcasts on the fly,
and — because the scale is per OUTPUT channel — applies it once to the
accumulator instead of per k-tile:

    y[:, n] = (sum_k x[:, k] * w8[k, n]) * scale[n]

Backward needs only dx (the base is frozen):

    dx = (g * scale) @ w8^T

which is the same kernel with the contraction over N — so one kernel body
serves both via different dimension numbers, and the custom VJP returns
symbolic zeros for the integer weight / frozen scale.

Tiled like the reference Pallas matmul (grid (M, N, K-reduction), fp32
accumulator scratch, ("parallel","parallel","arbitrary") semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)  # int8 -> compute dtype, in VMEM
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[0]).astype(o_ref.dtype)


def _mm_t_kernel(g_ref, w_ref, o_ref, acc_ref, *, n_k):
    """dx tile: (bm, bn_out=K-block) += g_tile (bm, bk=N-block) @ w8^T."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g = g_ref[...]
    w = w_ref[...].astype(g.dtype)  # (K_block, N_block)
    acc_ref[...] += jax.lax.dot_general(
        g, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def w8_matmul_2d(x, w_i8, scale, bm=256, bn=256, bk=512, interpret=False):
    """x (M, K) x w_i8 (K, N) * scale (N,) -> (M, K).N; fp32 accumulate."""
    return _w8_forward(x, w_i8, scale, bm, bn, bk, interpret)


def _w8_forward(x, w_i8, scale, bm, bn, bk, interpret):
    M0, K0 = x.shape
    _, N0 = w_i8.shape
    x, M = _pad_to(x, 0, min(bm, max(M0, 8)))
    bm = min(bm, x.shape[0])
    x, _ = _pad_to(x, 0, bm)
    x, _ = _pad_to(x, 1, bk if K0 >= bk else 128)
    bk_eff = min(bk, x.shape[1])
    x, _ = _pad_to(x, 1, bk_eff)
    w, _ = _pad_to(w_i8, 0, bk_eff)
    w, _ = _pad_to(w, 1, min(bn, max(N0, 128)))
    bn_eff = min(bn, w.shape[1])
    w, _ = _pad_to(w, 1, bn_eff)
    s = jnp.pad(scale.reshape(-1), (0, w.shape[1] - N0)).reshape(1, -1)

    Mp, Kp = x.shape
    Np = w.shape[1]
    n_k = Kp // bk_eff
    out = pl.pallas_call(
        functools.partial(_mm_kernel, n_k=n_k),
        grid=(Mp // bm, Np // bn_eff, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk_eff), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk_eff, bn_eff), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn_eff), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn_eff), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn_eff), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x, w, s)
    return out[:M0, :N0]


def _w8_vjp_fwd(x, w_i8, scale, bm, bn, bk, interpret):
    return _w8_forward(x, w_i8, scale, bm, bn, bk, interpret), \
        (x, w_i8, scale)


def _w8_vjp_bwd(bm, bn, bk, interpret, res, g):
    x, w_i8, scale, = res
    M0, K0 = x.shape
    _, N0 = w_i8.shape
    gs = (g.astype(jnp.float32) * scale.reshape(1, -1)).astype(g.dtype)

    gs, _ = _pad_to(gs, 0, min(bm, max(M0, 8)))
    bm_eff = min(bm, gs.shape[0])
    gs, _ = _pad_to(gs, 0, bm_eff)
    # contraction over N now
    bkn = min(bk, max(N0, 128))
    gs, _ = _pad_to(gs, 1, bkn)
    w, _ = _pad_to(w_i8, 1, bkn)
    bno = min(bn, max(K0, 128))
    w, _ = _pad_to(w, 0, bno)

    Mp, Np = gs.shape
    Kp = w.shape[0]
    n_k = Np // bkn
    dx = pl.pallas_call(
        functools.partial(_mm_t_kernel, n_k=n_k),
        grid=(Mp // bm_eff, Kp // bno, n_k),
        in_specs=[
            pl.BlockSpec((bm_eff, bkn), lambda i, j, k: (i, k)),
            pl.BlockSpec((bno, bkn), lambda i, j, k: (j, k)),
        ],
        out_specs=pl.BlockSpec((bm_eff, bno), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Kp), g.dtype),
        scratch_shapes=[pltpu.VMEM((bm_eff, bno), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(gs, w)
    dx = dx[:M0, :K0]
    zero_w = jax.custom_derivatives.zero_from_primal(w_i8,
                                                     symbolic_zeros=True)
    return dx, zero_w, jnp.zeros_like(scale)


w8_matmul_2d.defvjp(_w8_vjp_fwd, _w8_vjp_bwd)


def w8_matmul(x, qw: dict, *, interpret: bool = False):
    """(..., K) @ quantized {w_i8 (K, N), scale (1, N)} -> (..., N)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    y = w8_matmul_2d(x.reshape(-1, K), qw["w_i8"], qw["scale"].reshape(-1),
                     256, 256, 512, interpret)
    return y.reshape(*lead, -1)
