"""Length-aware decode attention (paged-attention style, Pallas).

The decode hot loop attends one new token against the KV cache.  The plain
path reads the ENTIRE static cache every layer every step; this kernel
follows the paged-attention recipe — one manual DMA per KV block, skipped
entirely for blocks beyond the current sequence position — so HBM traffic
scales with the *valid* cache prefix, not the allocated maximum.

Differences from full paged attention: the cache is contiguous
(layer-stacked (N, B, S, K, hd)) rather than a page table — the serving
layer here allocates one cache per micro-batch, so page indirection is
unnecessary; what matters on TPU is (a) not loading invalid blocks and
(b) reading the cache straight from HBM without a per-layer copy.  The
layer index and current length arrive as scalar prefetch so one kernel
instance serves every layer of the decode fori_loop.

DMA layout: Mosaic requires the slab's second-to-last dim 8-aligned, and
K (e.g. 20 kv heads) is not — so the cache is viewed as (N, B, S, K*hd)
(free reshape of contiguous trailing dims), each block moves as one
contiguous (block, K*hd) slab, and the kernel slices per-head lanes
(kh*hd:(kh+1)*hd, lane-aligned at hd=128) in a static head loop.

Forward-only (decode never differentiates).

STATUS: correct (parity + poisoned-tail tests) but EXPERIMENTAL — measured
12x slower than the in-place fori_loop eager path at 3B/b8/S1024 on v5e:
the single-buffered per-block DMA serializes against compute and the
per-head G=1 matmuls run on the VPU.  Needs double buffering (guide
pattern) and head-packed tiles before it can win; decode defaults keep
``paged_decode=False``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(layer_ref, length_ref, q_ref, mask_ref, k_hbm, v_hbm, o_ref,
            m_scr, l_scr, acc_scr, k_buf, v_buf, sem, *, block_k, n_kv, hd,
            scale):
    b = pl.program_id(0)
    i = pl.program_id(1)
    layer = layer_ref[0]
    length = length_ref[0]

    @pl.when(i == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when(i * block_k < length)
    def _():
        # one contiguous DMA per block: (block, K*hd) slab
        ck = pltpu.make_async_copy(
            k_hbm.at[layer, b, pl.ds(i * block_k, block_k)], k_buf,
            sem.at[0])
        cv = pltpu.make_async_copy(
            v_hbm.at[layer, b, pl.ds(i * block_k, block_k)], v_buf,
            sem.at[1])
        ck.start()
        cv.start()

        k_ids = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)[0]
        ok = (k_ids < length) & (mask_ref[0, 0] > 0)

        ck.wait()
        cv.wait()
        for kh in range(n_kv):  # static head loop; lane-aligned slices
            q_h = q_ref[0, kh]                              # (G, hd)
            k_h = k_buf[:, kh * hd:(kh + 1) * hd]           # (bk, hd)
            s = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(ok[None, :], s, NEG_INF)

            m_prev = m_scr[kh]                              # (G,)
            l_prev = l_scr[kh]
            m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
            alpha = jnp.exp(m_prev - m_cur)
            p = jnp.exp(s - m_cur[:, None])
            l_cur = l_prev * alpha + jnp.sum(p, axis=1)
            v_h = v_buf[:, kh * hd:(kh + 1) * hd]
            pv = jax.lax.dot_general(
                p.astype(v_h.dtype), v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (G, hd)
            acc = acc_scr[kh] * alpha[:, None] + pv
            acc_scr[kh] = acc
            m_scr[kh] = m_cur
            l_scr[kh] = l_cur
            # normalized write every processed block: skipped tail blocks
            # leave the final value in place
            safe = jnp.where(l_cur == 0.0, 1.0, l_cur)
            o_ref[0, kh] = (acc / safe[:, None]).astype(o_ref.dtype)


def paged_decode_attention(q, cache_k, cache_v, attn_mask, layer_idx,
                           length, *, block_k: int = 256,
                           interpret: bool = False):
    """q: (B, 1, H, hd) single-token queries; cache_k/v: (N, B, S, K, hd)
    layer-stacked HBM cache; attn_mask: (B, S) validity; layer_idx, length:
    scalars (current layer, valid slots incl. the token just written).

    Returns (B, 1, H, hd)."""
    B, _, H, hd = q.shape
    N, _, S, KH, _ = cache_k.shape
    G = H // KH
    bk = min(block_k, S)
    nb = pl.cdiv(S, bk)
    scale = 1.0 / (hd ** 0.5)

    qg = q[:, 0].reshape(B, KH, G, hd)
    k_flat = cache_k.reshape(N, B, S, KH * hd)
    v_flat = cache_v.reshape(N, B, S, KH * hd)
    scalars = (jnp.asarray(layer_idx, jnp.int32).reshape(1),
               jnp.asarray(length, jnp.int32).reshape(1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, KH, G, hd), lambda b, i, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, i, *_: (b, 0, i)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((1, KH, G, hd), lambda b, i, *_: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((KH, G), jnp.float32),
            pltpu.VMEM((KH, G), jnp.float32),
            pltpu.VMEM((KH, G, hd), jnp.float32),
            pltpu.VMEM((bk, KH * hd), cache_k.dtype),
            pltpu.VMEM((bk, KH * hd), cache_v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block_k=bk, n_kv=KH, hd=hd, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, G, hd), q.dtype),
        interpret=interpret,
    )(*scalars, qg, attn_mask.astype(jnp.int32)[:, None, :], k_flat, v_flat)
    return out.reshape(B, 1, H, hd)
