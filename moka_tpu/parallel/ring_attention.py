"""Ring attention: context-parallel causal attention over a sequence mesh
axis.

The reference has NO long-context support (SURVEY.md §5: sequences ~900
tokens, no ring/Ulysses/CP anywhere); this is the capability extension the
survey marks as the natural TPU design.  The sequence is sharded over a
``seq`` mesh axis; each device keeps its q shard and rotates k/v shards
around the ring with ``jax.lax.ppermute`` (ICI neighbor exchanges).  Each
visited shard contributes a *normalized* partial ``(out_j, lse_j)`` and
partials merge with the exact log-sum-exp rule

    lse = logaddexp(lse_a, lse_b)
    out = out_a * exp(lse_a - lse) + out_b * exp(lse_b - lse)

Everything is jnp + ppermute inside ``shard_map``, so XLA derives the
backward ring automatically — no custom VJP.  Communication rides ICI and
overlaps with the current block's compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _block_attn(q, k, v, key_mask, q_start, k_start, scale):
    """Normalized partial attention of a local q shard against one k/v
    shard.

    q: (b, Lq, H, hd); k/v: (b, Lk, K, hd); key_mask: (b, Lk) validity.
    Returns (out (b, Lq, H, hd) fp32, lse (b, Lq, H) fp32); fully-masked
    rows return out=0, lse=NEG_INF (zero weight in the combine)."""
    b, Lq, H, hd = q.shape
    Lk, K = k.shape[1], k.shape[2]
    G = H // K
    qg = q.reshape(b, Lq, K, G, hd)
    s = jnp.einsum("blkgh,bskh->bkgls", qg, k,
                   preferred_element_type=jnp.float32) * scale
    q_ids = q_start + jnp.arange(Lq)
    k_ids = k_start + jnp.arange(Lk)
    ok = (q_ids[:, None] >= k_ids[None, :])[None, None, None] & \
        (key_mask[:, None, None, None, :] > 0)
    s = jnp.where(ok, s, NEG_INF)
    m = jnp.max(s, axis=-1)                              # (b,K,G,Lq)
    p = jnp.exp(s - m[..., None])
    p = jnp.where(ok, p, 0.0)                            # kill masked lanes
    l = jnp.sum(p, axis=-1)
    any_valid = l > 0
    out = jnp.einsum("bkgls,bskh->blkgh", (p / jnp.maximum(
        l, 1e-30)[..., None]).astype(jnp.float32), v.astype(jnp.float32),
        preferred_element_type=jnp.float32)
    lse = jnp.where(any_valid, m + jnp.log(jnp.maximum(l, 1e-30)), NEG_INF)
    lse = lse.transpose(0, 3, 1, 2).reshape(b, Lq, H)
    out = jnp.where(any_valid.transpose(0, 3, 1, 2).reshape(
        b, Lq, H)[..., None], out.reshape(b, Lq, H, hd), 0.0)
    return out, lse


def _merge(out_a, lse_a, out_b, lse_b):
    lse = jnp.logaddexp(lse_a, lse_b)
    wa = jnp.exp(lse_a - lse)
    wb = jnp.exp(lse_b - lse)
    return out_a * wa[..., None] + out_b * wb[..., None], lse


def _pad_seq(x, mult, axis=1):
    L = x.shape[axis]
    Lp = -(-L // mult) * mult
    if Lp == L:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, Lp - L)
    return jnp.pad(x, pad)


def make_ring_flash_attention(mesh: Mesh, axis: str = "seq",
                              block_q: int = 512, block_k: int = 512,
                              interpret: bool | None = None):
    """Ring attention with the Pallas flash kernel per visited k/v shard —
    the per-shard (b, K, G, Lq, Lk) dense score tensor of the jnp ring is
    never materialized; each shard contributes a flash (out_j, lse_j) pair
    merged with the exact log-sum-exp rule.

    Backward is a second ring: the flash backward only needs the final
    (global) lse and delta = sum(dout*out), so it decomposes exactly over
    k/v shards — each device computes ``dq += flash_dq(q, k_j, v_j)`` for
    every visiting shard and accumulates ``(dk_j, dv_j)`` into the shard's
    carried gradient slot, which travels the full ring back to its owner.

    Same signature/semantics as ``make_ring_attention``: global (b, L, H,
    hd) q / (b, L, K, hd) k, v / (b, L) attn_mask, causal, sequence sharded
    on ``axis``.  Local shard lengths are padded to the flash block size
    (padded keys masked, padded queries sliced off)."""
    from moka_tpu.ops.flash_attention import (_flash_bwd_dkv, _flash_bwd_dq,
                                              _flash_fwd_res)
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    n_shards = mesh.shape[axis]
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def _partial_flash(q, k, v, key_mask, q_offset, scale, interp):
        """One shard's normalized partial: (b,Lq,H,hd)x(b,Lk,K,hd) ->
        (out (b,Lq,H,hd) fp32, lse (b,Lq,H) fp32)."""
        out, lse = _flash_fwd_res(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), key_mask, q_offset, True, scale,
            block_q, block_k, interp)
        return (out.transpose(0, 2, 1, 3).astype(jnp.float32),
                lse.transpose(0, 2, 1))

    def _ring_fwd_local(q, k, v, key_mask, l_true, interp):
        idx = jax.lax.axis_index(axis)
        b, Lq, H, hd = q.shape
        scale = 1.0 / (hd ** 0.5)
        acc = jnp.zeros((b, Lq, H, hd), jnp.float32)
        lse = jnp.full((b, Lq, H), NEG_INF, jnp.float32)
        kv = (k, v, key_mask, jnp.full((), idx, jnp.int32))
        for step in range(n_shards):
            k_s, v_s, mask_s, src = kv
            # kernel q positions are relative to THIS k shard's global
            # start; global offsets use the UNPADDED shard length (padded q
            # rows are sliced off, padded k rows masked)
            out_j, lse_j = _partial_flash(q, k_s, v_s, mask_s,
                                          (idx - src) * l_true, scale,
                                          interp)
            acc, lse = _merge(acc, lse, out_j, lse_j)
            if step < n_shards - 1:
                kv = jax.lax.ppermute(kv, axis, perm)
        return acc, lse

    def _ring_bwd_local(q, k, v, key_mask, lse, delta, dout, l_true,
                        interp):
        idx = jax.lax.axis_index(axis)
        b, Lq, H, hd = q.shape
        scale = 1.0 / (hd ** 0.5)
        qt = q.transpose(0, 2, 1, 3)
        dot = dout.transpose(0, 2, 1, 3)
        lse_t = lse.transpose(0, 2, 1)
        delta_t = delta.transpose(0, 2, 1)
        dq = jnp.zeros_like(qt, jnp.float32)
        kv = (k, v, key_mask, jnp.full((), idx, jnp.int32),
              jnp.zeros(k.shape, jnp.float32).transpose(0, 2, 1, 3),
              jnp.zeros(v.shape, jnp.float32).transpose(0, 2, 1, 3))
        for _ in range(n_shards):
            k_s, v_s, mask_s, src, dk_s, dv_s = kv
            kt = k_s.transpose(0, 2, 1, 3)
            vt = v_s.transpose(0, 2, 1, 3)
            qoff = (idx - src) * l_true
            dq = dq + _flash_bwd_dq(qt, kt, vt, mask_s, dot, lse_t, delta_t,
                                    qoff, True, scale, block_q, block_k,
                                    interp)
            dkj, dvj = _flash_bwd_dkv(qt, kt, vt, mask_s, dot, lse_t,
                                      delta_t, qoff, True, scale, block_q,
                                      block_k, interp)
            # n_shards permutes total: the accumulated grads arrive home
            kv = jax.lax.ppermute(
                (k_s, v_s, mask_s, src, dk_s + dkj, dv_s + dvj), axis, perm)
        *_, dk, dv = kv
        return (dq.transpose(0, 2, 1, 3).astype(q.dtype),
                dk.transpose(0, 2, 1, 3).astype(k.dtype),
                dv.transpose(0, 2, 1, 3).astype(v.dtype))

    def _make_local(interp, l_true):
        @jax.custom_vjp
        def ring_local(q, k, v, key_mask):
            acc, _ = _ring_fwd_local(q, k, v, key_mask, l_true, interp)
            return acc.astype(q.dtype)

        def fwd(q, k, v, key_mask):
            acc, lse = _ring_fwd_local(q, k, v, key_mask, l_true, interp)
            out = acc.astype(q.dtype)
            return out, (q, k, v, key_mask, out, lse)

        def bwd(res, dout):
            q, k, v, key_mask, out, lse = res
            delta = jnp.sum(dout.astype(jnp.float32) *
                            out.astype(jnp.float32), axis=-1)  # (b,Lq,H)
            dq, dk, dv = _ring_bwd_local(q, k, v, key_mask, lse, delta,
                                         dout, l_true, interp)
            return dq, dk, dv, None

        ring_local.defvjp(fwd, bwd)
        return ring_local

    smap = functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, axis, None, None),
                  P(None, axis, None, None), P(None, axis)),
        out_specs=P(None, axis, None, None))
    try:  # pallas_call out_shapes carry no vma info; skip that check
        smap = functools.partial(smap, check_vma=False)
        smap(lambda q, k, v, m: q)  # probe the kwarg
    except TypeError:
        smap = functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(None, axis, None, None), P(None, axis, None, None),
                      P(None, axis, None, None), P(None, axis)),
            out_specs=P(None, axis, None, None))

    @smap
    def ring(q, k, v, attn_mask):
        interp = interpret
        if interp is None:  # Mosaic kernels need interpret mode off-TPU
            interp = jax.default_backend() != "tpu"
        L = q.shape[1]
        bq = min(block_q, block_k, L)
        q_p = _pad_seq(q, bq)
        k_p = _pad_seq(k, bq)
        v_p = _pad_seq(v, bq)
        mask_p = _pad_seq(attn_mask, bq)
        out = _make_local(interp, L)(q_p, k_p, v_p, mask_p)
        return out[:, :L]

    return ring


def make_ring_attention(mesh: Mesh, axis: str = "seq"):
    """Returns ring_mha(q, k, v, attn_mask) over GLOBAL (b, L, H|K, hd)
    arrays sharded on L along ``axis``; causal; output sharded the same."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    n_shards = mesh.shape[axis]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, axis, None, None),
                  P(None, axis, None, None), P(None, axis)),
        out_specs=P(None, axis, None, None))
    def ring(q, k, v, attn_mask):
        idx = jax.lax.axis_index(axis)
        b, Lq, H, hd = q.shape
        scale = 1.0 / (hd ** 0.5)
        q_start = idx * Lq
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

        acc = jnp.zeros((b, Lq, H, hd), jnp.float32)
        lse = jnp.full((b, Lq, H), NEG_INF, jnp.float32)
        kv = (k, v, attn_mask, jnp.full((), idx, jnp.int32))
        for step in range(n_shards):
            k_s, v_s, mask_s, src = kv
            out_j, lse_j = _block_attn(q, k_s, v_s, mask_s, q_start,
                                       src * Lq, scale)
            acc, lse = _merge(acc, lse, out_j, lse_j)
            if step < n_shards - 1:
                kv = jax.lax.ppermute(kv, axis, perm)
        return acc.astype(q.dtype)

    return ring
