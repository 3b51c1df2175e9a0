"""Rotary position embeddings with linear / dynamic-NTK scaling.

Reference: ``AudioVisualText/models/modeling_llama.py:92-178`` (RotaryEmbedding,
LinearScaling, DynamicNTKScaling) and ``apply_rotary_pos_emb``
(``modeling_llama.py:266-291``).  Functional: no cached cos/sin buffers —
XLA constant-folds them under jit for static positions and computes them on
the fly otherwise (cheap VPU work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rope_frequencies(head_dim: int, theta: float,
                     scaling: tuple[str, float] | None,
                     seq_len: int | None = None,
                     max_seq_len: int = 2048) -> Array:
    """inv_freq (head_dim/2,) with optional NTK rescaling of theta.

    ``seq_len`` is the TOTAL attended length (cache length + current chunk
    for cached decode — the reference scales by ``kv_seq_len``,
    ``modeling_llama.py:160-178``) and may be a traced value: the rescale
    clamps at ``max_seq_len`` so lengths within the window leave theta
    unchanged, exactly like the reference's ``if seq_len > max`` branch."""
    if scaling is not None and scaling[0] == "dynamic" and seq_len is not None:
        factor = scaling[1]
        sl = jnp.maximum(jnp.asarray(seq_len, jnp.float32),
                         jnp.float32(max_seq_len))
        theta = theta * ((factor * sl / max_seq_len) - (factor - 1)) ** (
            head_dim / (head_dim - 2))
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponent)


def rope_cos_sin(positions: Array, head_dim: int, theta: float = 10000.0,
                 scaling: tuple[str, float] | None = None,
                 seq_len: int | None = None,
                 max_seq_len: int = 2048) -> tuple[Array, Array]:
    """cos/sin of shape positions.shape + (head_dim,), fp32."""
    inv_freq = rope_frequencies(head_dim, theta, scaling, seq_len, max_seq_len)
    pos = positions.astype(jnp.float32)
    if scaling is not None and scaling[0] == "linear":
        pos = pos / scaling[1]
    freqs = pos[..., None] * inv_freq  # (..., head_dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: Array) -> Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """x: (b, L, n_heads, head_dim); cos/sin: (b, L, head_dim) fp32 tables.

    Applied in x's dtype — matching the reference, whose
    ``apply_rotary_pos_emb`` multiplies by cos/sin caches kept in the layer
    dtype (``modeling_llama.py:266-291``).  The rotation works on the two
    half-planes directly (cos/sin duplicate their halves, so half-width
    tables suffice): ``out = [x1*c - x2*s, x2*c + x1*s]``.  The previous
    form — fp32 upcast + ``rotate_half`` (slice/negate/concat of a full-width
    copy) — materialized two fp32 copies of each (b,L,heads,hd) q/k tensor
    and profiled at ~78 ms (~6%) of the 7B train step, pure HBM traffic."""
    half = x.shape[-1] // 2
    c = cos[:, :, None, :half].astype(x.dtype)
    s = sin[:, :, None, :half].astype(x.dtype)
    x1 = x[..., :half]
    x2 = x[..., half:]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
