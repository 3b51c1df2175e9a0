"""Fused LoRA-dropout + A-projection (Pallas, TPU): in-kernel PRNG.

Why: ``ops.moka.lora_dropout`` materializes three full-width tensors per
adapter call on the (b, L, d_in) input — the random bits, the masked
``x_d`` write, and its read back by the A dot — and under remat the whole
chain runs again in backward.  A dropout-off A/B on the 7B flagship
measures the chain at ~50 ms/step (5,800 vs 5,415 tok/s), none of it
hidden by XLA's async scheduler (unlike the CE and save-set bytes, which
measured fully overlapped).  This kernel reads x ONCE per pass, draws the
Bernoulli bits from the per-core PRNG *inside* the kernel (seeded from the
call's PRNG key + the row-block id, so the backward regenerates the
identical mask from the same seeds instead of storing or re-materializing
anything), and writes only the skinny (N, M*r) rank projection.

Semantics: per-element Bernoulli(keep) dropout on the A input with
inverted scaling — the same contract as the reference's ``lora.py:371,403``
and ``ops.moka.lora_dropout`` — at 2^-32 probability granularity, but a
DIFFERENT random stream (Mosaic's per-core PRNG vs ``jax.random.bits``),
just as both already differ stream-wise from torch.  Gradients are exact
for the drawn mask: dx = (g @ A^T) * mask/keep, dA = x_d^T @ g, with the
backward mask regenerated bit-identically from the same per-block seeds.

Interpret mode (CPU tests): Mosaic's prng primitives have no interpret
lowering, so the wrapper precomputes the bits with ``jax.random.bits`` and
feeds them through a block-mapped input — identical kernel math, testable
exactly against the jnp reference given the same bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _threshold(rate: float) -> int:
    keep = 1.0 - rate
    return min(0xFFFFFFFF, int(round(keep * 4294967296.0)))


def _keep_mask(seed_ref, bits_ref, shape, thresh, use_prng):
    if use_prng:
        # per-block seeding makes the draw independent of grid order and
        # lets the backward regenerate the identical mask
        pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    else:
        bits = bits_ref[...]
    return bits < jnp.uint32(thresh)


def _fwd_kernel(seed_ref, *refs, thresh, inv_keep, use_prng):
    if use_prng:
        x_ref, a_ref, o_ref = refs
        bits_ref = None
    else:
        x_ref, a_ref, bits_ref, o_ref = refs
    keep = _keep_mask(seed_ref, bits_ref, x_ref.shape, thresh, use_prng)
    x = x_ref[...]
    xd = jnp.where(keep, x * jnp.asarray(inv_keep, x.dtype),
                   jnp.zeros((), x.dtype))
    o_ref[...] = jax.lax.dot_general(
        xd, a_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _bwd_kernel(seed_ref, *refs, thresh, inv_keep, use_prng):
    if use_prng:
        x_ref, a_ref, g_ref, dx_ref, da_ref, da_scr = refs
        bits_ref = None
    else:
        x_ref, a_ref, bits_ref, g_ref, dx_ref, da_ref, da_scr = refs
    i, n = pl.program_id(0), pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        da_scr[:] = jnp.zeros_like(da_scr)

    keep = _keep_mask(seed_ref, bits_ref, x_ref.shape, thresh, use_prng)
    x = x_ref[...]
    m = jnp.where(keep, jnp.float32(inv_keep), 0.0)  # (blk, d)
    g = g_ref[...]                                   # (blk, Mr) fp32
    a32 = a_ref[...].astype(jnp.float32)
    dx = jax.lax.dot_general(g, a32, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ref[...] = (dx * m).astype(dx_ref.dtype)
    xd32 = x.astype(jnp.float32) * m
    da_scr[:] += jax.lax.dot_general(
        xd32, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == n - 1)
    def _():
        da_ref[...] = da_scr[:]


def _pad_rows(arr, Np):
    return arr if arr.shape[0] == Np else \
        jnp.pad(arr, ((0, Np - arr.shape[0]),) + ((0, 0),) * (arr.ndim - 1))


def _vmem_params(interpret, semantics):
    # fwd has no cross-block state -> parallel; bwd accumulates dA in a
    # scratch across blocks -> arbitrary (sequential)
    return None if interpret else pltpu.CompilerParams(
        dimension_semantics=(semantics,),
        vmem_limit_bytes=100 * 1024 * 1024)


def _run_fwd(x2d, a_flat, seeds, bits, rate, block_rows, use_prng,
             interpret):
    N, d = x2d.shape
    Mr = a_flat.shape[1]
    blk = min(block_rows, N)
    Np = -(-N // blk) * blk
    x2d = _pad_rows(x2d, Np)
    ins = [seeds, x2d, a_flat]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((blk, d), lambda i: (i, 0)),
                pl.BlockSpec((d, Mr), lambda i: (0, 0))]
    if not use_prng:
        ins.append(_pad_rows(bits, Np))
        in_specs.append(pl.BlockSpec((blk, d), lambda i: (i, 0)))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, thresh=_threshold(rate),
                          inv_keep=1.0 / (1.0 - rate), use_prng=use_prng),
        grid=(Np // blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((blk, Mr), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, Mr), jnp.float32),
        compiler_params=_vmem_params(interpret, "parallel"),
        interpret=interpret,
    )(*ins)
    return out[:N]


def _run_bwd(x2d, a_flat, seeds, bits, g, rate, block_rows, use_prng,
             interpret):
    N, d = x2d.shape
    Mr = a_flat.shape[1]
    blk = min(block_rows, N)
    Np = -(-N // blk) * blk
    x2d = _pad_rows(x2d, Np)
    g = _pad_rows(g.astype(jnp.float32), Np)
    ins = [seeds, x2d, a_flat]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((blk, d), lambda i: (i, 0)),
                pl.BlockSpec((d, Mr), lambda i: (0, 0))]
    if not use_prng:
        ins.append(_pad_rows(bits, Np))
        in_specs.append(pl.BlockSpec((blk, d), lambda i: (i, 0)))
    ins.append(g)
    in_specs.append(pl.BlockSpec((blk, Mr), lambda i: (i, 0)))
    dx, da = pl.pallas_call(
        functools.partial(_bwd_kernel, thresh=_threshold(rate),
                          inv_keep=1.0 / (1.0 - rate), use_prng=use_prng),
        grid=(Np // blk,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0)),
                   pl.BlockSpec((d, Mr), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((Np, d), x2d.dtype),
                   jax.ShapeDtypeStruct((d, Mr), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((d, Mr), jnp.float32)],
        compiler_params=_vmem_params(interpret, "arbitrary"),
        interpret=interpret,
    )(*ins)
    return dx[:N], da.astype(a_flat.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _drop_a(x2d, a_flat, seeds, bits, rate, block_rows, use_prng,
            interpret):
    return _run_fwd(x2d, a_flat, seeds, bits, rate, block_rows, use_prng,
                    interpret)


def _drop_a_vjp_fwd(x2d, a_flat, seeds, bits, rate, block_rows, use_prng,
                    interpret):
    out = _run_fwd(x2d, a_flat, seeds, bits, rate, block_rows, use_prng,
                   interpret)
    return out, (x2d, a_flat, seeds, bits)


def _drop_a_vjp_bwd(rate, block_rows, use_prng, interpret, res, g):
    x2d, a_flat, seeds, bits = res
    dx, da = _run_bwd(x2d, a_flat, seeds, bits, g, rate, block_rows,
                      use_prng, interpret)
    return dx, da, None, None


_drop_a.defvjp(_drop_a_vjp_fwd, _drop_a_vjp_bwd)


def dropout_a_proj(x, lora_a, rng, rate, *, block_rows=None,
                   interpret=None, _force_bits=None):
    """``einsum('bld,mdr->mblr', lora_dropout(x, rng, rate), lora_a)``
    with the dropout fused into the A dot (fp32 output, like the jnp path).

    ``_force_bits``: tests only — a precomputed (b*L, d) uint32 bits array
    to use instead of any PRNG, valid in both interpret and compiled mode.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_rows is None:
        import os
        block_rows = int(os.environ.get("MOKA_FDROP_BLOCK", "512"))
    b, L, d = x.shape
    M, _, r = lora_a.shape
    x2d = x.reshape(b * L, d)
    a_flat = jnp.transpose(lora_a, (1, 0, 2)).reshape(d, M * r)
    kd = jax.random.key_data(rng).reshape(-1)[:2].astype(jnp.uint32)
    seeds = jax.lax.bitcast_convert_type(kd, jnp.int32)
    if _force_bits is not None:
        use_prng, bits = False, _force_bits
    elif interpret:
        use_prng = False
        bits = jax.random.bits(rng, (b * L, d), dtype=jnp.uint32)
    else:
        use_prng = True
        bits = jnp.zeros((1, 1), jnp.uint32)  # placeholder, not read
    out = _drop_a(x2d, a_flat, seeds, bits, float(rate), block_rows,
                  use_prng, interpret)
    return out.reshape(b, L, M, r).transpose(2, 0, 1, 3)
