"""Token sampling: temperature / top-k / top-p (nucleus), fully vectorized.

The reference inherits sampling from its vendored HF GenerationMixin fork
(``AudioVisualText/models/my_utils.py`` ``sample()`` loop + the standard
``TopKLogitsWarper``/``TopPLogitsWarper``), though its released eval drivers
all run greedy (``mmbench.py:633`` ``do_sample: False``).  Here the warpers
are one static-shape function usable inside ``lax.scan`` decode loops and the
serving engine: per-ROW parameters are arrays, so a continuous-batching step
can sample each lane with its own (temperature, top_k, top_p) without
retracing.

Filtering semantics match HF:
  * top_k: keep the k highest logits (k <= 0 means off);
  * top_p: keep the smallest prefix of the descending-sorted distribution
    whose cumulative probability reaches p, always including the first token
    at or past the boundary (p >= 1 means off);
  * temperature scales logits before filtering; temperature == 0 means
    greedy argmax (HF expresses greedy as ``do_sample=False`` instead).

Sampling uses the Gumbel-max trick — an argmax over perturbed logits — so
the whole step stays one fused elementwise + reduce, no categorical
partition sums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _as_row(x, b: int, dtype) -> Array:
    x = jnp.asarray(x, dtype)
    return jnp.broadcast_to(jnp.atleast_1d(x), (b,))


def filter_logits(logits: Array, top_k: Array | int = 0,
                  top_p: Array | float = 1.0) -> Array:
    """Mask logits outside the top-k / nucleus set to -inf.

    logits: (b, V); top_k int or (b,) int (<=0 disables); top_p float or
    (b,) float (>=1 disables).  Per-row dynamic k/p: the sort is shared and
    thresholds are gathered per row, so mixed per-lane settings cost the
    same as uniform ones.
    """
    b, v = logits.shape
    top_k = _as_row(top_k, b, jnp.int32)
    top_p = _as_row(top_p, b, jnp.float32)
    neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)

    # --- top-k stage: threshold = k-th largest logit (ties keep every equal
    # logit, like HF's ``logits < kth`` comparison)
    sorted_desc = -jnp.sort(-logits, axis=-1)  # (b, V) descending
    k = jnp.clip(top_k, 1, v)
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    keep_k = (logits >= kth) | (top_k[:, None] <= 0)
    out = jnp.where(keep_k, logits, neg)

    # --- top-p stage, applied to the top-k-FILTERED distribution (HF chains
    # the warpers, so the nucleus renormalizes over the k survivors; the
    # ``neg`` entries underflow to probability 0 in the softmax).  A token is
    # dropped when the cumulative probability BEFORE it already reaches p —
    # the boundary-crossing token stays (HF's shift-right of the removal
    # mask).
    sorted_f = jnp.where((sorted_desc >= kth) | (top_k[:, None] <= 0),
                         sorted_desc, neg)  # descending, top-k-filtered
    probs = jax.nn.softmax(sorted_f.astype(jnp.float32), axis=-1)
    csum_before = jnp.cumsum(probs, axis=-1) - probs
    kept_sorted = csum_before < top_p[:, None]
    # threshold logit = smallest kept sorted logit per row
    thresh = jnp.min(jnp.where(kept_sorted, sorted_f,
                               jnp.inf), axis=-1, keepdims=True)
    keep_p = (out >= thresh.astype(out.dtype)) | (top_p[:, None] >= 1.0)
    # HF min_tokens_to_keep=1: the argmax always survives (covers top_p -> 0)
    keep_p = keep_p | (out >= sorted_desc[:, :1])

    return jnp.where(keep_p, out, neg)


def sample_tokens(logits: Array, rng: Array,
                  temperature: Array | float = 1.0,
                  top_k: Array | int = 0,
                  top_p: Array | float = 1.0) -> Array:
    """Draw one token per row; temperature == 0 rows take the argmax.

    logits: (b, V) raw (pre-softmax); rng: PRNG key; temperature / top_k /
    top_p: scalars or (b,) arrays.  Returns (b,) int32.
    """
    b, v = logits.shape
    temperature = _as_row(temperature, b, jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    scaled = logits.astype(jnp.float32) / jnp.maximum(
        temperature[:, None], 1e-6)
    filtered = filter_logits(scaled, top_k, top_p)
    gumbel = jax.random.gumbel(rng, (b, v), jnp.float32)
    sampled = jnp.argmax(filtered + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temperature > 0, sampled, greedy)
