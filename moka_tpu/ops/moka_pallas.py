"""Fused MokA adapter delta as a single Pallas kernel.

SURVEY.md §7 names this kernel: for a token block, compute the per-modality
down projections ``a_i = (x * m_i) @ A_i``, the rank-space attention of each
non-text stream against the question keys, and the shared up projection
``@ B`` — all while the block stays in VMEM.  The XLA path
(``ops/moka.py``) materializes the (M, b, L, r) rank tensor and the (b, L,
L) score matrices in HBM between those steps; here they live and die in
VMEM.

At r<=8 the matmuls are skinny, so this is a bandwidth play, not a FLOPs
play: one read of x, one write of delta.  The question keys are tiny
((L, r) per sample) and are precomputed outside with one einsum, then
broadcast to every block.

Differentiation: forward runs the kernel; the custom VJP backward evaluates
the vjp of the reference jnp implementation (``moka_delta``) — exact
gradients, one recompute, no hand-written backward kernel to maintain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moka_tpu.ops.moka import MokaSpec, moka_delta

NEG_INF = -1e30


def _kernel(x_ref, masks_ref, qmask_ref, keys_ref, a_ref, b_ref, out_ref, *,
            spec: MokaSpec, seq_len: int, block: int):
    """Grid: (batch, token-blocks).

    x_ref: (1, Bt, d_in); masks_ref: (1, M, Bt); qmask_ref: (1, 1, L);
    keys_ref: (1, L, r) question-key stream (pre-scaled A0 output * qmask);
    a_ref: (M, d_in, r); b_ref: (r, d_out); out_ref: (1, Bt, d_out)."""
    # x stays in its storage dtype (bf16 on TPU): the mixed dot downcasts
    # A to bf16 on the MXU, perturbing rank-attention logits by ~0.4%% —
    # immaterial at trained adapter scales and matching bf16 deployment
    # numerics; the fp32 interpret-mode tests pin the exact math, and
    # training defaults to the jnp path.
    x = x_ref[0]                                     # (Bt, d)
    keys = keys_ref[0].astype(jnp.float32)           # (L, r)
    qmask = qmask_ref[0, 0]                          # (L,)

    buf = jnp.zeros((x.shape[0], b_ref.shape[0]), jnp.float32)
    attn_scale = 1.0 / jnp.sqrt(jnp.float32(spec.rank))
    has_q = jnp.sum(qmask) > 0

    for i in range(spec.num_modalities):
        a_i = jax.lax.dot_general(
            x, a_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        a_i = a_i * masks_ref[0, i][:, None] * jnp.float32(spec.pre_scale)
        buf = buf + a_i
        if i in spec.attn_modalities:
            s = jax.lax.dot_general(
                a_i, keys, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * attn_scale
            s = jnp.where(qmask[None, :] > 0, s, NEG_INF)
            p = jax.nn.softmax(s, axis=-1)
            p = jnp.where(has_q, p, 0.0)
            attn = jax.lax.dot_general(
                p, keys, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            buf = buf + masks_ref[0, i][:, None] * (
                jnp.float32(spec.attn_weight) * attn)

    delta = jax.lax.dot_general(
        buf, b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if spec.post_scales is not None:
        post = jnp.zeros((x.shape[0],), jnp.float32)
        for i, ps in enumerate(spec.post_scales):
            post = post + masks_ref[0, i] * jnp.float32(ps)
        delta = delta * post[:, None]
    out_ref[0] = delta.astype(out_ref.dtype)


def _fused_fwd(x, lora_a, lora_b, modality_masks, question_mask, spec,
               block, interpret):
    b, L, d_in = x.shape
    r, d_out = lora_b.shape
    # VMEM sizing: with Pallas double-buffering, a block costs roughly
    # 2*x_in + 2*out + fp32 compute; at 7B's wide projections (11008) a
    # 256-token block needs ~20-40 MB — over the compiler's default 16 MB
    # scoped limit but comfortably inside the chip's 128 MB VMEM, so the
    # limit is raised below and the block only shrinks for truly huge rows.
    budget = 48 * 1024 * 1024
    per_token = (2 * d_in * x.dtype.itemsize + 2 * d_out * x.dtype.itemsize
                 + d_out * 4)
    fit = max(128, 1 << ((budget // per_token).bit_length() - 1))
    blk = min(block, L, fit)
    vmem_limit = 100 * 1024 * 1024
    Lp = -(-L // blk) * blk
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
        modality_masks = jnp.pad(modality_masks,
                                 ((0, 0), (0, 0), (0, Lp - L)))
    # question keys: a0 over the full (unpadded) sequence, masked
    keys = jnp.einsum("bld,dr->blr", x[:, :L], lora_a[0],
                      preferred_element_type=jnp.float32,
                      precision="highest")
    keys = keys * (modality_masks[0, :, :L] * question_mask)[..., None] \
        * jnp.float32(spec.pre_scale)

    out = pl.pallas_call(
        functools.partial(_kernel, spec=spec, seq_len=L, block=blk),
        grid=(b, Lp // blk),
        in_specs=[
            pl.BlockSpec((1, blk, d_in), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, spec.num_modalities, blk),
                         lambda bi, ti: (bi, 0, ti)),
            pl.BlockSpec((1, 1, L), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, L, r), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((spec.num_modalities, d_in, r),
                         lambda bi, ti: (0, 0, 0)),
            pl.BlockSpec((r, d_out), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk, d_out), lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b, Lp, d_out), x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(x, modality_masks.transpose(1, 0, 2).astype(jnp.float32),
      question_mask[:, None, :].astype(jnp.float32),
      keys.astype(jnp.float32), lora_a.astype(jnp.float32),
      lora_b.astype(jnp.float32))
    return out[:, :L]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def moka_delta_fused(x, lora_a, lora_b, modality_masks, question_mask,
                     spec: MokaSpec, block: int = 256,
                     interpret: bool = False):
    """Fused MokA delta — same contract as ``moka.moka_delta`` (no dropout:
    the fused path targets inference/prefill; training keeps the jnp path
    when dropout is active)."""
    return _fused_fwd(x, lora_a, lora_b, modality_masks, question_mask,
                      spec, block, interpret)


def _fused_vjp_fwd(x, lora_a, lora_b, modality_masks, question_mask, spec,
                   block, interpret):
    out = _fused_fwd(x, lora_a, lora_b, modality_masks, question_mask, spec,
                     block, interpret)
    return out, (x, lora_a, lora_b, modality_masks, question_mask)


def _fused_vjp_bwd(spec, block, interpret, res, g):
    x, lora_a, lora_b, modality_masks, question_mask = res
    # exact gradients via the reference jnp implementation
    _, vjp = jax.vjp(
        lambda x_, a_, b_: moka_delta(x_, a_, b_, modality_masks,
                                      question_mask, spec),
        x, lora_a, lora_b)
    dx, da, db = vjp(g)
    return dx, da, db, None, None


moka_delta_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)
