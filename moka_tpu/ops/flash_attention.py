"""Flash attention (Pallas, TPU): causal + key-padding masking, GQA, custom
VJP with flash backward — never materializes the (B, H, L, S) score tensor.

Why: the XLA attention path writes fp32 scores to HBM three times per layer
under remat (fwd, recompute, bwd) — at the reference recipe's shapes
(L ~ 1k, H 20-32) that is hundreds of MB per layer and the main MFU
limiter of the fine-tune step.  Numerics match the eager path (fp32
softmax, reference ``modeling_llama.py:367``) to output-dtype rounding.

Masking is built inline from an ``attn_mask`` (B, S) validity vector plus a
scalar ``q_offset`` (cache position at prefill/decode) — the dense
(b, 1, L, S) bias of the naive path is never formed.  Layout inside the
kernels is (B*H, L, hd) with the K/V index map folding GQA
(``kv_head = head // group``).  ``interpret=True`` runs the same kernels on
CPU for the parity tests.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Base-2 softmax: the wrappers fold scale * log2(e) into q, the kernels use
# exp2 instead of exp (p = exp2(u - m) == exp(s - m) exactly, since
# u = s * log2e), saving the per-element x*log2e multiply that exp lowers to
# on the VPU — these kernels are transcendental-bound, so the score-matrix
# exp passes are the cost.  The lse residual stays in NATURAL log units at
# the kernel boundary (finalize converts per ROW, not per element), so
# external consumers (ring attention's shard-lse combine) are unchanged;
# dk needs a ln2 correction because it contracts against the pre-scaled q.
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def _valid(q_ids, k_ids, mask_blk, causal, kv_len):
    # kv_len guards the ragged tail block (out-of-bounds lanes are padding)
    ok = (mask_blk[None, :] > 0) & (k_ids[None, :] < kv_len)
    if causal:
        ok = ok & (q_ids[:, None] >= k_ids[None, :])
    return ok


def _ids(offset, block, dim):
    return offset + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)[:, 0]


# ------------------------------------------------------------- forward ----

def _fwd_kernel(qoff_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, causal, scale, block_q, block_k,
                kv_len, conditional=False):
    kb, nk = pl.program_id(2), pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qb = pl.program_id(1)
    q_ids = _ids(qoff_ref[0] + qb * block_q, block_q, 0)
    k_ids = _ids(kb * block_k, block_k, 0)

    run = True
    if causal:
        run = kb * block_k <= qoff_ref[0] + (qb + 1) * block_q - 1

    def _accum(s):
        m_prev = m_scr[:, 0]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp2(m_prev - m_cur)
        p = jnp.exp2(s - m_cur[:, None])
        l_scr[:, 0] = l_scr[:, 0] * alpha + jnp.sum(p, axis=1)
        v = v_ref[0]
        acc_scr[:] = acc_scr[:] * alpha[:, None] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:, 0] = m_cur

    def _score():
        # q arrives pre-scaled by log2e/sqrt(hd) (folded once per call in
        # the wrapper — one (L, hd) pass instead of a (bq, bk) pass per
        # block), so s is in BASE-2 log units and _accum uses exp2
        return jax.lax.dot_general(q_ref[0], k_ref[0],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    if not conditional:
        @pl.when(run)
        def _():
            s = _score()
            s = jnp.where(_valid(q_ids, k_ids, mask_ref[0, 0], causal,
                                 kv_len), s, NEG_INF)
            _accum(s)
    else:
        # Long-context variant: INTERIOR blocks (strictly below the causal
        # diagonal, no ragged tail, no padded keys) skip the valid/where
        # passes entirely.  Two branches; exactly one executes per block.
        # Measured neutral at L=1024 (1 of 3 live blocks interior, r4);
        # at L>=4k the interior fraction approaches 1/2 per live row band.
        interior = (jnp.min(mask_ref[0, 0]) > 0) & \
            (kb * block_k + block_k <= kv_len)
        if causal:
            interior = interior & (
                kb * block_k + block_k - 1 < qoff_ref[0] + qb * block_q)

        @pl.when(jnp.logical_and(run, interior))
        def _():
            _accum(_score())

        @pl.when(jnp.logical_and(run, jnp.logical_not(interior)))
        def _():
            s = _score()
            s = jnp.where(_valid(q_ids, k_ids, mask_ref[0, 0], causal,
                                 kv_len), s, NEG_INF)
            _accum(s)

    @pl.when(kb == nk - 1)
    def _():
        l = l_scr[:, 0]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / safe[:, None]).astype(o_ref.dtype)
        # natural-log units at the boundary: lse = ln2 * log2-sum-exp2
        lse_ref[0, 0] = (m_scr[:, 0] + jnp.log2(safe)) * LN2


# ------------------------------------------------------------ backward ----

def _bwd_dq_kernel(qoff_ref, q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, dq_scr, *, causal, scale, block_q,
                   block_k, kv_len):
    kb, nk = pl.program_id(2), pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    qb = pl.program_id(1)
    q_ids = _ids(qoff_ref[0] + qb * block_q, block_q, 0)
    k_ids = _ids(kb * block_k, block_k, 0)
    run = True
    if causal:
        run = kb * block_k <= qoff_ref[0] + (qb + 1) * block_q - 1

    @pl.when(run)
    def _():
        q = q_ref[0]  # pre-scaled by log2e/sqrt(hd) in the wrapper
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(_valid(q_ids, k_ids, mask_ref[0, 0], causal, kv_len), s, NEG_INF)
        # lse arrives in natural units; s is base-2 — convert per ROW
        lse_row = lse_ref[0, 0][:, None] * LOG2E
        # a fully-masked query row has lse = NEG_INF, making exp(s - lse) = 1
        # across the block; zero it so such rows contribute no gradient even
        # under nonzero cotangents
        p = jnp.where(lse_row > NEG_INF * 0.5,
                      jnp.exp2(s - lse_row), 0.0)
        do = do_ref[0]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0][:, None])
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(kb == nk - 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(qoff_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                    lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                    causal, scale, block_q, block_k, kv_len):
    qb, nq = pl.program_id(2), pl.num_programs(2)

    @pl.when(qb == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    kb = pl.program_id(1)
    q_ids = _ids(qoff_ref[0] + qb * block_q, block_q, 0)
    k_ids = _ids(kb * block_k, block_k, 0)
    run = True
    if causal:
        # skip q blocks entirely above this k block's diagonal
        run = qoff_ref[0] + (qb + 1) * block_q - 1 >= kb * block_k

    @pl.when(run)
    def _():
        q = q_ref[0]  # pre-scaled by log2e/sqrt(hd) in the wrapper
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(_valid(q_ids, k_ids, mask_ref[0, 0], causal, kv_len), s, NEG_INF)
        # lse arrives in natural units; s is base-2 — convert per ROW
        lse_row = lse_ref[0, 0][:, None] * LOG2E
        p = jnp.where(lse_row > NEG_INF * 0.5,
                      jnp.exp2(s - lse_row), 0.0)  # (Bq, Bk)
        do = do_ref[0]
        pb = p.astype(do.dtype)
        dv_scr[:] += jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0][:, None])
        # no trailing *scale: the pre-scaled q carries scale * log2e; the
        # ln2 correction cancels the log2e at the (bk, hd) write-out below
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qb == nq - 1)
    def _():
        dk_ref[0] = (dk_scr[:] * LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(qoff_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                      lse_ref, delta_ref, dq_ref, dk_ref, dv_ref, *,
                      causal, scale, kv_len):
    """Whole-sequence backward: dq, dk, dv in ONE kernel body.

    Used when the padded (L, S) fits a single (bwd_block_q, bwd_block_k)
    block — the flagship shape (L=1024).  The separate dq/dkv kernels each
    rebuild the score matrix, its masking, the softmax exp, and the dp dot
    (7 block dots + 2 exp passes per (bh)); with one visit per output this
    computes them once (5 dots + 1 exp).  These kernels are VPU-bound, so
    halving the score-matrix passes is the point."""
    q_ids = _ids(qoff_ref[0], q_ref.shape[1], 0)
    k_ids = _ids(0, k_ref.shape[1], 0)
    q = q_ref[0]  # pre-scaled by log2e/sqrt(hd) in the wrapper
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.where(_valid(q_ids, k_ids, mask_ref[0, 0], causal, kv_len),
                  s, NEG_INF)
    # lse arrives in natural units; s is base-2 — convert per ROW
    lse_row = lse_ref[0, 0][:, None] * LOG2E
    p = jnp.where(lse_row > NEG_INF * 0.5, jnp.exp2(s - lse_row), 0.0)
    do = do_ref[0]
    pb = p.astype(do.dtype)
    dv_ref[0] = jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0][:, None])
    dsb = ds.astype(q.dtype)
    dq_ref[0] = (jax.lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    # the pre-scaled q carries scale * log2e; ln2 cancels the log2e
    dk_ref[0] = (jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * LN2).astype(dk_ref.dtype)


def _flash_bwd_fused(q, k, v, attn_mask, dout, lse, delta, q_offset, causal,
                     scale, interpret):
    """Single-block fused backward: (dq, dk, dv) with dk/dv fp32
    GQA-group-summed, same contract as ``_flash_bwd_dq``+``_flash_bwd_dkv``."""
    B, H, L, hd = q.shape
    KH, S = k.shape[1], k.shape[2]
    G = H // KH
    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1)
    q_r = (q * jnp.asarray(scale * LOG2E, q.dtype)).reshape(B * H, L, hd)
    k_r = k.reshape(B * KH, S, hd)
    v_r = v.reshape(B * KH, S, hd)
    do_r = dout.reshape(B * H, L, hd)
    lse_r = lse.reshape(B * H, 1, L)
    delta_r = delta.reshape(B * H, 1, L)
    mask_i = attn_mask.astype(jnp.int32)[:, None, :]

    kv_spec = pl.BlockSpec((1, S, hd),
                           lambda bh, H=H, KH=KH, G=G:
                           ((bh // H) * KH + (bh % H) // G, 0, 0))
    q_spec = pl.BlockSpec((1, L, hd), lambda bh: (bh, 0, 0))
    row_spec = pl.BlockSpec((1, 1, L), lambda bh: (bh, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, causal=causal, scale=scale,
                          kv_len=S),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            q_spec, kv_spec, kv_spec,
            pl.BlockSpec((1, 1, S), lambda bh, H=H: (bh // H, 0, 0)),
            q_spec, row_spec, row_spec,
        ],
        out_specs=[q_spec,
                   pl.BlockSpec((1, S, hd), lambda bh: (bh, 0, 0)),
                   pl.BlockSpec((1, S, hd), lambda bh: (bh, 0, 0))],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, L, hd), q.dtype),
            jax.ShapeDtypeStruct((B * H, S, hd), jnp.float32),
            jax.ShapeDtypeStruct((B * H, S, hd), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(qoff, q_r, k_r, v_r, mask_i, do_r, lse_r, delta_r)
    dq = dq.reshape(B, H, L, hd)
    dk = dk.reshape(B, KH, G, S, hd).sum(axis=2)
    dv = dv.reshape(B, KH, G, S, hd).sum(axis=2)
    return dq, dk, dv


# ------------------------------------------------------------- wrapper ----

@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def _flash(q, k, v, attn_mask, q_offset, causal, scale, block_q, block_k,
           bwd_block_q, bwd_block_k, interpret, conditional=False):
    out, _ = _flash_fwd_res(q, k, v, attn_mask, q_offset, causal, scale,
                            block_q, block_k, interpret,
                            conditional=conditional)
    return out


def _specs(B, H, KH, L, S, hd, block_q, block_k):
    """in_spec index maps for (q, k/v, mask); grid (B*H, q-block, k-block).
    bh decomposes as (batch = bh // H, head = bh % H); the k/v array is
    (B*KH, S, hd) indexed by batch * KH + head // group."""
    G = H // KH

    def kv_block(bh, o, i):
        return ((bh // H) * KH + (bh % H) // G, i, 0)

    def q_block(bh, o, i):
        return (bh, o, 0)

    def mask_block(bh, o, i):
        return (bh // H, 0, i)

    return q_block, kv_block, mask_block


def _flash_fwd_res(q, k, v, attn_mask, q_offset, causal, scale, block_q,
                   block_k, interpret, conditional=False):
    B, H, L, hd = q.shape
    KH, S = k.shape[1], k.shape[2]
    bq, bk = min(block_q, L), min(block_k, S)
    nq, nk = pl.cdiv(L, bq), pl.cdiv(S, bk)
    q_block, kv_block, mask_block = _specs(B, H, KH, L, S, hd, bq, bk)
    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1)
    q = (q * jnp.asarray(scale * LOG2E, q.dtype))  # folded 1/sqrt(hd), see kernel

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, causal=causal, scale=scale,
                          block_q=bq, block_k=bk, kv_len=S,
                          conditional=conditional),
        grid=(B * H, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, hd), q_block),
            pl.BlockSpec((1, bk, hd), kv_block),
            pl.BlockSpec((1, bk, hd), kv_block),
            pl.BlockSpec((1, 1, bk), mask_block),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hd), q_block),
            pl.BlockSpec((1, 1, bq), lambda bh, o, i: (bh, 0, o)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, L, hd), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, L), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, hd), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qoff, q.reshape(B * H, L, hd), k.reshape(B * KH, S, hd),
      v.reshape(B * KH, S, hd), attn_mask.astype(jnp.int32)[:, None, :])
    return out.reshape(B, H, L, hd), lse.reshape(B, H, L)


def _flash_vjp_fwd(q, k, v, attn_mask, q_offset, causal, scale, block_q,
                   block_k, bwd_block_q, bwd_block_k, interpret,
                   conditional=False):
    out, lse = _flash_fwd_res(q, k, v, attn_mask, q_offset, causal, scale,
                              block_q, block_k, interpret,
                              conditional=conditional)
    # Named so remat save policies can keep the residuals and skip the
    # flash-forward recompute in the backward pass ("attn_res" policies).
    from jax.ad_checkpoint import checkpoint_name
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, attn_mask, q_offset, out, lse)


def _flash_bwd_dq(q, k, v, attn_mask, dout, lse, delta, q_offset, causal,
                  scale, block_q, block_k, interpret):
    """dq of flash attention given the GLOBAL-row lse/delta.  Because the
    backward only needs the final lse and delta = sum(dout*out), it
    decomposes exactly over k/v shards — the ring-attention backward calls
    this per visited shard (``parallel/ring_attention.py``).
    q (B,H,L,hd), k/v (B,KH,S,hd), lse/delta (B,H,L) -> dq (B,H,L,hd)."""
    B, H, L, hd = q.shape
    KH, S = k.shape[1], k.shape[2]
    G = H // KH
    bq, bk = min(block_q, L), min(block_k, S)
    nq, nk = pl.cdiv(L, bq), pl.cdiv(S, bk)
    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1)
    q_r = (q * jnp.asarray(scale * LOG2E, q.dtype)).reshape(B * H, L, hd)
    k_r = k.reshape(B * KH, S, hd)
    v_r = v.reshape(B * KH, S, hd)
    do_r = dout.reshape(B * H, L, hd)
    lse_r = lse.reshape(B * H, 1, L)
    delta_r = delta.reshape(B * H, 1, L)
    mask_i = attn_mask.astype(jnp.int32)[:, None, :]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, causal=causal, scale=scale,
                          block_q=bq, block_k=bk, kv_len=S),
        grid=(B * H, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, hd), lambda bh, o, i: (bh, o, 0)),
            pl.BlockSpec((1, bk, hd), lambda bh, o, i, H=H, KH=KH, G=G: ((bh // H) * KH + (bh % H) // G, i, 0)),
            pl.BlockSpec((1, bk, hd), lambda bh, o, i, H=H, KH=KH, G=G: ((bh // H) * KH + (bh % H) // G, i, 0)),
            pl.BlockSpec((1, 1, bk), lambda bh, o, i, H=H: (bh // H, 0, i)),
            pl.BlockSpec((1, bq, hd), lambda bh, o, i: (bh, o, 0)),
            pl.BlockSpec((1, 1, bq), lambda bh, o, i: (bh, 0, o)),
            pl.BlockSpec((1, 1, bq), lambda bh, o, i: (bh, 0, o)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda bh, o, i: (bh, o, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, L, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, hd), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qoff, q_r, k_r, v_r, mask_i, do_r, lse_r, delta_r)
    return dq.reshape(B, H, L, hd)


def _flash_bwd_dkv(q, k, v, attn_mask, dout, lse, delta, q_offset, causal,
                   scale, block_q, block_k, interpret):
    """dk/dv of flash attention given the GLOBAL-row lse/delta; same
    shard-decomposition property as ``_flash_bwd_dq``.  Returns fp32
    (B,KH,S,hd) pairs, GQA-group-summed."""
    B, H, L, hd = q.shape
    KH, S = k.shape[1], k.shape[2]
    G = H // KH
    bq, bk = min(block_q, L), min(block_k, S)
    nq, nk = pl.cdiv(L, bq), pl.cdiv(S, bk)
    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1)
    q_r = (q * jnp.asarray(scale * LOG2E, q.dtype)).reshape(B * H, L, hd)
    k_r = k.reshape(B * KH, S, hd)
    v_r = v.reshape(B * KH, S, hd)
    do_r = dout.reshape(B * H, L, hd)
    lse_r = lse.reshape(B * H, 1, L)
    delta_r = delta.reshape(B * H, 1, L)
    mask_i = attn_mask.astype(jnp.int32)[:, None, :]

    # grid (BH, nk, nq), accumulate over q blocks; per-head results summed
    # over the GQA group afterwards.
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, causal=causal, scale=scale,
                          block_q=bq, block_k=bk, kv_len=S),
        grid=(B * H, nk, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, hd), lambda bh, o, i: (bh, i, 0)),
            pl.BlockSpec((1, bk, hd), lambda bh, o, i, H=H, KH=KH, G=G: ((bh // H) * KH + (bh % H) // G, o, 0)),
            pl.BlockSpec((1, bk, hd), lambda bh, o, i, H=H, KH=KH, G=G: ((bh // H) * KH + (bh % H) // G, o, 0)),
            pl.BlockSpec((1, 1, bk), lambda bh, o, i, H=H: (bh // H, 0, o)),
            pl.BlockSpec((1, bq, hd), lambda bh, o, i: (bh, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda bh, o, i: (bh, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda bh, o, i: (bh, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, hd), lambda bh, o, i: (bh, o, 0)),
            pl.BlockSpec((1, bk, hd), lambda bh, o, i: (bh, o, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, S, hd), jnp.float32),
            jax.ShapeDtypeStruct((B * H, S, hd), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bk, hd), jnp.float32),
                        pltpu.VMEM((bk, hd), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qoff, q_r, k_r, v_r, mask_i, do_r, lse_r, delta_r)

    dk = dk.reshape(B, KH, G, S, hd).sum(axis=2)
    dv = dv.reshape(B, KH, G, S, hd).sum(axis=2)
    return dk, dv


def _flash_vjp_bwd(causal, scale, block_q, block_k, bwd_block_q,
                   bwd_block_k, interpret, conditional, res, dout):
    q, k, v, attn_mask, q_offset, out, lse = res
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)  # (B, H, L)
    if bwd_block_q >= q.shape[2] and bwd_block_k >= k.shape[2]:
        # whole sequence in one block (the flagship L=1024): fused kernel
        # computes s/p/dp once for all three grads instead of twice
        dq, dk, dv = _flash_bwd_fused(q, k, v, attn_mask, dout, lse, delta,
                                      q_offset, causal, scale, interpret)
    else:
        dq = _flash_bwd_dq(q, k, v, attn_mask, dout, lse, delta, q_offset,
                           causal, scale, bwd_block_q, bwd_block_k,
                           interpret)
        dk, dv = _flash_bwd_dkv(q, k, v, attn_mask, dout, lse, delta,
                                q_offset, causal, scale, bwd_block_q,
                                bwd_block_k, interpret)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None, None


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_mha(q, k, v, attn_mask, q_offset=0, *, causal=True, block_q=512,
              block_k=512, bwd_block_q=1024, bwd_block_k=1024,
              interpret=None, conditional=None):
    """Drop-in for ``ops.attention.mha``: q (b, L, H, hd), k/v (b, S, K, hd),
    attn_mask (b, S) validity, q_offset = position of query 0 in the key
    axis.  Returns (b, L, H, hd).

    The backward kernels take their own (larger) block sizes: the on-chip
    sweep at the flagship shape (exp_flash_tune.py, B4 H32 L1024 hd128)
    puts the forward fastest at 512x512 but the dq/dkv pair ~40% faster at
    1024x1024 (fewer grid revisits of the fp32 accumulator scratch beats
    the lost causal-block skipping there) — mixing both bests cuts the
    fwd+bwd pair ~16% per call.  Blocks are clamped to the actual (L, S).

    Ragged lengths are padded up to the block size here (Pallas clamps
    out-of-range tail blocks, which would desync the position ids inside the
    kernel); padded keys are masked out via attn_mask.

    ``conditional``: forward-kernel interior blocks (strictly below the
    causal diagonal, no padding) skip the valid/where masking passes.
    MEASURED NEGATIVE at both L=1024 (r4, −0.3%) and L=4096 (r5, −0.5%
    at b1: 3,671 vs 3,691 tok/s) — the two-branch code duplication costs
    more than the skipped (bq, bk) passes, so the default is OFF at every
    length; opt in explicitly or via MOKA_FLASH_COND=1 (parity-tested)."""
    if interpret is None:  # Mosaic kernels need interpret mode off-TPU
        interpret = jax.default_backend() != "tpu"
    hd = q.shape[-1]
    L, S = q.shape[1], k.shape[1]
    if conditional is None:
        conditional = os.environ.get("MOKA_FLASH_COND") == "1"
    bq, bk = min(block_q, L), min(block_k, S)
    Lp = -(-L // bq) * bq
    Sp = -(-S // bk) * bk
    # the bwd pair may only use its larger blocks where they divide the
    # padded length (a ragged tail block would desync the position ids);
    # otherwise it falls back to the forward blocks
    bwd_bq = min(bwd_block_q, Lp)
    bwd_bk = min(bwd_block_k, Sp)
    if Lp % bwd_bq:
        bwd_bq = bq
    if Sp % bwd_bk:
        bwd_bk = bk
    if Lp != L:
        q = jnp.pad(q, ((0, 0), (0, Lp - L), (0, 0), (0, 0)))
    if Sp != S:
        k = jnp.pad(k, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        attn_mask = jnp.pad(attn_mask, ((0, 0), (0, Sp - S)))
    scale = 1.0 / (hd ** 0.5)
    out = _flash(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                 v.transpose(0, 2, 1, 3), attn_mask, q_offset, causal,
                 scale, block_q, block_k, bwd_bq, bwd_bk, interpret,
                 bool(conditional))
    return out.transpose(0, 2, 1, 3)[:, :L]
