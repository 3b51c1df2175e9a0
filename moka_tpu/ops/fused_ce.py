"""Fused lm_head + cross-entropy (Pallas, TPU): logits never touch HBM.

The chunked CE (``llama.chunked_cross_entropy``) avoids the fp32
(b, L, V) logits tensor but still round-trips each chunk's bf16 logits
through HBM between the head dot and log_softmax (~6 passes per chunk of
131 MB at 7B/V=32k), plus a rematerialized second round in backward —
the ~64 ms/step CE block of the round-4 profile (PERFORMANCE.md), vs a
~10 ms traffic/compute floor.  This kernel computes the head dot tiled
over V with a flash-style online logsumexp, so only per-row nll/lse
(and, in backward, dX) ever leave VMEM.

Forward, per (row-block, v-tile): logits = (x @ w_int8_tile) * scale;
online (m, l) update; the target logit is extracted with an iota-onehot
reduction (no gather).  Backward recomputes each tile's logits from the
saved lse, forms P - onehot (the exact softmax-CE gradient; dW is not
needed — the head is frozen), and accumulates dX = (P - onehot) @ w^T
in an fp32 scratch.  The head stays int8 in HBM (half the weight reads);
the dots run bf16 after an in-kernel int8->bf16 cast — a deliberate
retreat from int8 MXU dots inside Mosaic after the round-3 fused
int8-matmul failure (TODO.md: wrong under Mosaic despite interpret
parity).

Reference being replaced: the full-logits materialization of the
reference's forward + HF loss; here the fused path is opt-in
(``pallas_ce``) beside the XLA-chunked default and parity-tested against
it (``tests/test_fused_ce.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _fwd_kernel(x_ref, w_ref, ws_ref, t_ref, nll_ref, lse_ref,
                m_scr, l_scr, tgt_scr, *, block_v, v_real):
    vt, nvt = pl.program_id(1), pl.num_programs(1)

    @pl.when(vt == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        tgt_scr[:] = jnp.zeros_like(tgt_scr)

    x = x_ref[...]                               # (R, d) bf16
    wt = w_ref[...].astype(jnp.bfloat16)         # (d, Vt) int8 -> bf16
    logits = jax.lax.dot_general(
        x, wt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * ws_ref[0][None, :]
    v0 = vt * block_v
    v_ids = v0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    # vocab padded up to a block_v multiple: phantom columns -> -inf
    logits = jnp.where(v_ids < v_real, logits, NEG_INF)
    t = t_ref[...][:, 0]                         # (R,) int32 targets
    tgt_scr[:, 0] += jnp.sum(
        jnp.where(v_ids == t[:, None], logits, 0.0), axis=1)

    m_prev = m_scr[:, 0]
    m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=1))
    l_scr[:, 0] = l_scr[:, 0] * jnp.exp(m_prev - m_cur) + \
        jnp.sum(jnp.exp(logits - m_cur[:, None]), axis=1)
    m_scr[:, 0] = m_cur

    @pl.when(vt == nvt - 1)
    def _():
        lse = m_scr[:, 0] + jnp.log(l_scr[:, 0])
        lse_ref[:, 0] = lse
        nll_ref[:, 0] = lse - tgt_scr[:, 0]


def _bwd_kernel(x_ref, w_ref, ws_ref, t_ref, lse_ref, gw_ref, dx_ref,
                dx_scr, *, block_v, v_real):
    vt, nvt = pl.program_id(1), pl.num_programs(1)

    @pl.when(vt == 0)
    def _():
        dx_scr[:] = jnp.zeros_like(dx_scr)

    x = x_ref[...]
    wt = w_ref[...].astype(jnp.bfloat16)
    logits = jax.lax.dot_general(
        x, wt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * ws_ref[0][None, :]
    v0 = vt * block_v
    v_ids = v0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(v_ids < v_real, logits, NEG_INF)
    p = jnp.exp(logits - lse_ref[...][:, 0][:, None])   # softmax tile
    t = t_ref[...][:, 0]
    p = jnp.where(v_ids == t[:, None], p - 1.0, p)
    # fold the per-row upstream cotangent AND the per-channel dequant
    # scale into p (R x Vt — fewer elements than rescaling wt)
    p = p * gw_ref[...][:, 0][:, None] * ws_ref[0][None, :]
    dx_scr[:] += jax.lax.dot_general(
        p.astype(jnp.bfloat16), wt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(vt == nvt - 1)
    def _():
        dx_ref[...] = dx_scr[:].astype(dx_ref.dtype)


def _vocab_pad(w_q, w_scale, block_v):
    V = w_q.shape[1]
    Vp = -(-V // block_v) * block_v
    if Vp != V:
        w_q = jnp.pad(w_q, ((0, 0), (0, Vp - V)))
        w_scale = jnp.pad(w_scale, ((0, 0), (0, Vp - V)))
    return w_q, w_scale, V


def _call_fwd(xp, w_q, w_scale, tp, block_r, block_v, interpret):
    Np, d = xp.shape
    w_q, w_scale, v_real = _vocab_pad(w_q, w_scale, block_v)
    V = w_q.shape[1]
    grid = (Np // block_r, V // block_v)
    nll, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_v=block_v, v_real=v_real),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, d), lambda r, v: (r, 0)),
            pl.BlockSpec((d, block_v), lambda r, v: (0, v)),
            pl.BlockSpec((1, block_v), lambda r, v: (0, v)),
            pl.BlockSpec((block_r, 1), lambda r, v: (r, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_r, 1), lambda r, v: (r, 0)),
            pl.BlockSpec((block_r, 1), lambda r, v: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_r, 1), jnp.float32),
                        pltpu.VMEM((block_r, 1), jnp.float32),
                        pltpu.VMEM((block_r, 1), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xp, w_q, w_scale, tp[:, None].astype(jnp.int32))
    return nll[:, 0], lse[:, 0]


# custom_vjp over (x, w, scale, targets): integer targets are
# non-differentiable leaves (None tangent); only x gets a gradient
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _nll_rows(x, w_q, w_scale, targets, ignore_index, block_r, block_v,
              interpret):
    nll, _ = _call_fwd(x, w_q, w_scale, targets, block_r, block_v,
                       interpret)
    return nll


def _nll_rows_fwd(x, w_q, w_scale, targets, ignore_index, block_r,
                  block_v, interpret):
    nll, lse = _call_fwd(x, w_q, w_scale, targets, block_r, block_v,
                         interpret)
    return nll, (x, w_q, w_scale, targets, lse)


def _nll_rows_bwd(ignore_index, block_r, block_v, interpret, res, g):
    x, w_q, w_scale, targets, lse = res
    Np, d = x.shape
    w_q, w_scale, v_real = _vocab_pad(w_q, w_scale, block_v)
    V = w_q.shape[1]
    grid = (Np // block_r, V // block_v)
    gw = g.astype(jnp.float32)  # (Np,) per-row cotangent
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, block_v=block_v, v_real=v_real),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, d), lambda r, v: (r, 0)),
            pl.BlockSpec((d, block_v), lambda r, v: (0, v)),
            pl.BlockSpec((1, block_v), lambda r, v: (0, v)),
            pl.BlockSpec((block_r, 1), lambda r, v: (r, 0)),
            pl.BlockSpec((block_r, 1), lambda r, v: (r, 0)),
            pl.BlockSpec((block_r, 1), lambda r, v: (r, 0)),
        ],
        out_specs=pl.BlockSpec((block_r, d), lambda r, v: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_r, d), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, w_q, w_scale, targets[:, None].astype(jnp.int32),
      lse[:, None], gw[:, None])
    return dx, None, None, None


_nll_rows.defvjp(_nll_rows_fwd, _nll_rows_bwd)


def _rows_pad(x, targets, block_r, ignore_index):
    N = x.shape[0]
    Np = -(-N // block_r) * block_r
    if Np != N:
        x = jnp.pad(x, ((0, Np - N), (0, 0)))
        targets = jnp.pad(targets, (0, Np - N),
                          constant_values=ignore_index)
    return x, targets, N, Np


def fused_ce_loss(h, lm_head, targets, *, ignore_index=-100,
                  block_r: int = 128, block_v: int = 512,
                  interpret=None):
    """Mean CE over valid targets with the logits-never-in-HBM kernel.

    h (rows, d), lm_head an int8-quantized ``{"w_i8", "scale"}`` dict
    (``quantize_llama_base(head_bits=8)`` layout), targets (rows,) int.
    Differentiable in h only (the head is frozen).  Ignored rows (target
    == ignore_index, incl. block padding) contribute nothing to loss or
    gradient — their zero cotangent flows through the mean's chain rule.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    w_q = lm_head["w_i8"]
    w_scale = lm_head["scale"].reshape(1, -1).astype(jnp.float32)
    xp, tp, N, Np = _rows_pad(h.astype(jnp.bfloat16), targets, block_r,
                              ignore_index)
    valid = (tp != ignore_index) & (jnp.arange(Np) < N)
    nll = _nll_rows(xp, w_q, w_scale, tp, ignore_index, block_r, block_v,
                    interpret)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / count
