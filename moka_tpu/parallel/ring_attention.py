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
