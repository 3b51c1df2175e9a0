"""MokA adapter math as pure, vectorized JAX ops.

MokA ("Multimodal low-rank Adaptation", arXiv 2506.05191) augments each frozen
linear projection with:

  1. per-modality LoRA-A down projections, applied only to that modality's
     tokens (token-level modality masks),
  2. cross-modal attention in rank space: non-text tokens attend to the
     *question* tokens' A-projected representations, added residually with a
     scalar weight,
  3. one shared LoRA-B up projection over the combined rank-space stream.

The reference implements this with per-sample Python loops over the batch
(``AudioVisualText/peft_hyper/tuners/lora.py:460-531`` and
``VisualText/modified_peft/tuners/lora/layer.py:548-681``).  Here the whole
thing is a handful of batched einsums: because the modality masks are
per-token row scalings, ``(x * m) @ A == m * (x @ A)``, and the per-sample
"slice the contiguous question span" key selection is exactly a masked
softmax (the question mask is contiguous by construction — it covers the
tokens between ``<question_start>`` and ``<question_end>``, reference
``unified_arch.py:153-163``).  Everything maps onto MXU matmuls + a tiny
rank-space attention, with no data-dependent shapes, so XLA fuses it into the
surrounding projection.

Two flavors exist in the reference and are unified here behind one function:

* AVT (tri-modal): A outputs pre-scaled by ``alpha / r0`` (``lora.py:325-329,
  403,477``), attention for video and audio streams with residual weight
  ``blc_weight`` (``lora.py:424,446,499,521``), no post-B scaling.
* VT (bi-modal): A outputs unscaled, attention for the image stream with
  residual weight ``attn_weight`` (``layer.py:653``), post-B scaling applied
  per token row by modality (``layer.py:662-668``).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MokaSpec:
    """Static description of one MokA adapter family.

    Attributes:
      num_modalities: number of per-modality A matrices (index 0 is always
        text; the question tokens are a subset of the text tokens).
      rank: LoRA rank r (the reference's AVT flavor encodes per-modality ranks
        as digits of one int, e.g. ``r=444`` -> three rank-4 A's; only equal
        ranks are ever used, and the shared B forces them equal anyway).
      attn_modalities: which modality streams run rank-space cross-attention
        against the question tokens (AVT: (1, 2) = video+audio; VT: (1,)).
      attn_weight: scalar weight on the attention residual (AVT
        ``blc_weight``, VT ``attn_weight``).
      pre_scale: scalar applied to every A output *before* attention
        (AVT: ``lora_alpha / rank``; VT: 1.0).
      post_scales: per-modality scalars applied to B output on that
        modality's token rows (AVT: all 1.0; VT: ``alpha/r`` per adapter).
        ``None`` means "all ones" (skip the per-token scaling entirely).
      dropout_rate: LoRA dropout on the A input (train only).
      bf16_dots: run the adapter einsums with bf16 MXU inputs + fp32
        accumulators instead of true-fp32 (``precision="highest"``) passes.
        The reference's adapter math is fp32 (torch default), so exactness
        tests keep this off; for training throughput the bf16-in/fp32-acc
        variant is numerically free at trained adapter scales (same policy
        the fused Pallas kernel uses) and avoids 6-pass fp32 MXU emulation
        over full activations.
    """

    num_modalities: int
    rank: int
    attn_modalities: tuple[int, ...]
    attn_weight: float
    pre_scale: float = 1.0
    post_scales: tuple[float, ...] | None = None
    dropout_rate: float = 0.0
    bf16_dots: bool = False
    flash_rank_attn: bool = False
    max_question_tokens: int | None = None
    fused_dropout: bool = False
    dropout_shared_masks: bool = False

    def with_bf16_dots(self) -> "MokaSpec":
        return dataclasses.replace(self, bf16_dots=True)

    def with_fused_dropout(self) -> "MokaSpec":
        """Run LoRA dropout fused into the A projection as a Pallas kernel
        with in-kernel PRNG (``ops/fused_dropout.py``): one read of x per
        pass instead of materializing the bits + the masked x_d per
        projection — the dropout chain measured ~50 ms/step un-overlapped
        on the 7B flagship.  Same Bernoulli(keep) semantics, different
        random stream from the jnp path (as both differ from torch)."""
        return dataclasses.replace(self, fused_dropout=True)

    def with_shared_dropout_masks(self) -> "MokaSpec":
        """One LoRA-dropout mask per DISTINCT adapter input tensor instead
        of one per projection: q/k/v read the same rmsnorm output, gate/up
        likewise — folding the same rng index for each group makes the
        three dropout chains identical subgraphs that XLA CSE collapses to
        one (7 -> 4 bits+mask chains per layer).  Each adapter still sees
        exact per-element Bernoulli(keep) dropout with inverted scaling;
        what changes vs the reference (independent per-module masks,
        ``lora.py:371,403``) is only the CORRELATION of masks across
        projections sharing an input.  Opt-in; quality-anchored before any
        recipe promotion (exp_quant_quality.py)."""
        return dataclasses.replace(self, dropout_shared_masks=True)

    def with_question_window(self, kq: int) -> "MokaSpec":
        """Bound the rank-attention key set to a static window of ``kq``
        positions around the question span.

        The question mask is contiguous by construction (it covers the
        tokens between ``<question_start>`` and ``<question_end>`` —
        reference ``unified_arch.py:153-163``), and the reference itself
        attends only to the sliced question span (``lora.py:489-496``:
        ``k_special = lora_A_output[qs_id+1:qe_id]``), not all L positions.
        With a window, scores/probs are (b, L, kq) instead of (b, L, L) —
        at L=1024, kq=128 that is 8x less softmax HBM traffic per modality
        per projection (fwd + remat + bwd) — while the math is unchanged:
        keys outside the span are masked to -inf and contribute exact zeros
        to the softmax in both forms.  Spans longer than ``kq`` would be
        silently truncated, so the data assembler must guarantee the bound
        (``assemble_sample`` raises on violation when a window is set)."""
        return dataclasses.replace(self, max_question_tokens=kq)

    def with_flash_rank_attn(self) -> "MokaSpec":
        """Run the rank-space cross-attention through the Pallas flash
        kernel: the (b, L, L) fp32 score tensor stays in VMEM instead of
        round-tripping HBM once per modality per projection (fwd + remat +
        bwd).  Same math, same fp32 softmax; only the online-softmax
        accumulation order differs."""
        return dataclasses.replace(self, flash_rank_attn=True)

    @staticmethod
    def avt(rank: int = 4, lora_alpha: float = 16.0, blc_weight: float = 1.0,
            dropout_rate: float = 0.05) -> "MokaSpec":
        """Tri-modal (text/video/audio) flavor — reference ``lora.py:277-532``."""
        return MokaSpec(
            num_modalities=3,
            rank=rank,
            attn_modalities=(1, 2),
            attn_weight=blc_weight,
            pre_scale=lora_alpha / rank,
            post_scales=None,
            dropout_rate=dropout_rate,
        )

    @staticmethod
    def vt(rank: int = 4, lora_alpha: float = 16.0, attn_weight: float = 0.05,
           dropout_rate: float = 0.05, use_rslora: bool = False) -> "MokaSpec":
        """Bi-modal (text/image) flavor — reference ``layer.py:389-681``."""
        scale = lora_alpha / math.sqrt(rank) if use_rslora else lora_alpha / rank
        return MokaSpec(
            num_modalities=2,
            rank=rank,
            attn_modalities=(1,),
            attn_weight=attn_weight,
            pre_scale=1.0,
            post_scales=(scale, scale),
            dropout_rate=dropout_rate,
        )


def init_moka_params(rng: Array, d_in: int, d_out: int, spec: MokaSpec,
                     dtype=jnp.float32) -> dict:
    """Kaiming-uniform A (fan_in mode, gain for a=sqrt(5)), zero B.

    Matches torch's ``kaiming_uniform_(w, a=math.sqrt(5))`` on a (r, d_in)
    weight: bound = sqrt(6 / ((1 + a^2) * fan_in)) = 1/sqrt(d_in)
    (reference ``lora.py:343-348``).
    """
    bound = 1.0 / math.sqrt(d_in)
    a = jax.random.uniform(
        rng, (spec.num_modalities, d_in, spec.rank), dtype=jnp.float32,
        minval=-bound, maxval=bound).astype(dtype)
    b = jnp.zeros((spec.rank, d_out), dtype=dtype)
    return {"a": a, "b": b}


def rank_space_cross_attention(q: Array, keys: Array, question_mask: Array,
                               dk: float, precision="highest") -> Array:
    """softmax(q @ keys^T / sqrt(dk)) @ keys, keys masked to question tokens.

    q: (b, L, r) queries (a modality's A-projected stream, all positions —
       non-modality rows are zero and get masked out by the caller).
    keys: (b, L, r) question-token stream (zero outside the question span).
    question_mask: (b, L) 0/1.
    Softmax runs in float32 (the r=4 logits are tiny; fp32 costs nothing and
    matches the reference's fp32-by-default adapter math).
    """
    scores = jnp.einsum("blr,bkr->blk", q, keys,
                        preferred_element_type=jnp.float32,
                        precision=precision)
    scores = scores / jnp.sqrt(jnp.float32(dk))
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype=scores.dtype)
    scores = jnp.where(question_mask[:, None, :] > 0, scores, neg)
    probs = jax.nn.softmax(scores, axis=-1)
    # Samples with no question tokens at all: attention contributes nothing
    # (the VT reference skips them — layer.py:636-637).
    has_q = jnp.sum(question_mask, axis=-1) > 0
    probs = jnp.where(has_q[:, None, None], probs, 0.0)
    return jnp.einsum("blk,bkr->blr", probs.astype(keys.dtype), keys)


def flash_rank_space_cross_attention(q: Array, keys: Array,
                                     question_mask: Array,
                                     dk: float) -> Array:
    """``rank_space_cross_attention`` on the Pallas flash kernel.

    One head of head_dim r: q/keys ride through ``flash_mha`` (causal off,
    ``attn_mask`` = the question mask, default scale = 1/sqrt(head_dim) =
    1/sqrt(dk)).  The kernel's fully-masked-row semantics reproduce the
    no-question-sample guard exactly: forward emits zero rows, backward
    zeroes their gradients (``flash_attention.py:81-86,116-120``).  Inputs
    keep their dtype (fp32 upstream) — at r=4 the dots are flop-free, the
    entire win is the (b, L, L) scores never touching HBM."""
    from moka_tpu.ops.flash_attention import flash_mha
    assert q.shape[-1] == dk, (q.shape, dk)
    out = flash_mha(q[:, :, None, :], keys[:, :, None, :],
                    keys[:, :, None, :], question_mask, causal=False)
    return out[:, :, 0, :]


def question_window(keys: Array, question_mask: Array,
                    kq: int) -> tuple[Array, Array]:
    """Gather a static-size window covering the (contiguous) question span.

    keys: (b, L, r); question_mask: (b, L) 0/1.  Returns (b, kq, r) keys and
    the (b, kq) mask restricted to the window.  The window starts at the
    first question token (clamped so it stays in bounds); rows without any
    question tokens get window [0, kq) with an all-zero mask, which the
    caller's has-question guard handles exactly as in the full-L path.
    """
    b, L, _ = keys.shape
    if kq >= L:
        return keys, question_mask
    start = jnp.argmax(question_mask > 0, axis=-1)  # (b,) 0 if no question
    start = jnp.minimum(start, L - kq)
    idx = start[:, None] + jnp.arange(kq, dtype=start.dtype)[None]  # (b, kq)
    keys_w = jnp.take_along_axis(keys, idx[..., None], axis=1)
    mask_w = jnp.take_along_axis(question_mask, idx, axis=1)
    return keys_w, mask_w


def lora_dropout(x: Array, rng: Array, rate: float) -> Array:
    """LoRA dropout on the adapter input (reference ``lora.py:371,403``).

    Raw-bits threshold compare: ``bits_u16 < keep * 2^16`` is Bernoulli(keep)
    at 2^-16 probability granularity — an order below the per-tensor
    empirical-rate shot noise at training sizes (sqrt(p(1-p)/45M) ≈ 3e-5) —
    while generating HALF the random bytes of ``jax.random.bernoulli``,
    which materializes u32 bits and converts them to an fp32 uniform before
    comparing.  The generate+compare+apply chain profiled at ~70 ms/step of
    the 7B flagship (fwd + bwd remat regeneration) in the bernoulli form.
    """
    keep = 1.0 - rate
    thresh = jnp.uint16(min(65535, int(round(keep * 65536.0))))
    bits = jax.random.bits(rng, x.shape, dtype=jnp.uint16)
    return jnp.where(bits < thresh,
                     x * jnp.asarray(1.0 / keep, x.dtype),
                     jnp.zeros((), x.dtype))


def moka_delta(x: Array, lora_a: Array, lora_b: Array,
               modality_masks: Array, question_mask: Array,
               spec: MokaSpec, *, dropout_rng: Array | None = None) -> Array:
    """The MokA low-rank delta for one linear layer (add to the frozen base).

    Args:
      x: (b, L, d_in) input activations.
      lora_a: (M, d_in, r) per-modality down projections (0 = text).
      lora_b: (r, d_out) shared up projection.
      modality_masks: (M, b, L) 0/1 token-level modality masks (disjoint).
      question_mask: (b, L) 0/1 mask of the question span (subset of text).
      spec: static MokaSpec.
      dropout_rng: if given and spec.dropout_rate > 0, applies LoRA dropout
        to the A input (training).

    Returns:
      (b, L, d_out) delta.
    """
    m, _, r = lora_a.shape
    assert m == spec.num_modalities and r == spec.rank
    prec = None if spec.bf16_dots else "highest"
    if spec.bf16_dots:
        lora_a = lora_a.astype(jnp.bfloat16)
        lora_b = lora_b.astype(jnp.bfloat16)
        x = x.astype(jnp.bfloat16)

    drop_active = dropout_rng is not None and spec.dropout_rate > 0.0
    if drop_active and spec.fused_dropout:
        # dropout fused into the A dot (in-kernel PRNG) — x_d and the bits
        # never touch HBM; see ops/fused_dropout.py
        from moka_tpu.ops.fused_dropout import dropout_a_proj
        a_all = dropout_a_proj(x, lora_a, dropout_rng, spec.dropout_rate)
    else:
        x_d = lora_dropout(x, dropout_rng, spec.dropout_rate) \
            if drop_active else x
        # (x * mask_i) @ A_i == mask_i * (x @ A_i): one batched matmul for
        # all modalities, masked afterwards.  (M, b, L, r)
        a_all = jnp.einsum("bld,mdr->mblr", x_d, lora_a,
                           preferred_element_type=jnp.float32,
                           precision=prec)
    a_all = a_all * modality_masks[..., None] * jnp.float32(spec.pre_scale)

    keys = a_all[0] * question_mask[..., None]  # (b, L, r)
    q_mask = question_mask
    if spec.max_question_tokens is not None and not spec.flash_rank_attn:
        # static window over the contiguous question span: scores shrink
        # from (b, L, L) to (b, L, kq) — same math, masked keys contribute
        # exact zeros either way (see MokaSpec.with_question_window)
        keys, q_mask = question_window(keys, question_mask,
                                       spec.max_question_tokens)

    buffer = jnp.sum(a_all, axis=0)
    for i in spec.attn_modalities:
        if spec.flash_rank_attn:
            attn = flash_rank_space_cross_attention(
                a_all[i], keys, question_mask, dk=spec.rank)
        else:
            attn = rank_space_cross_attention(a_all[i], keys, q_mask,
                                              dk=spec.rank, precision=prec)
        buffer = buffer + modality_masks[i][..., None] * (
            jnp.float32(spec.attn_weight) * attn)

    if spec.bf16_dots:
        buffer = buffer.astype(jnp.bfloat16)
    delta = jnp.einsum("blr,rd->bld", buffer, lora_b,
                       preferred_element_type=jnp.float32,
                       precision=prec)
    if spec.post_scales is not None:
        post = jnp.asarray(spec.post_scales, dtype=delta.dtype)
        token_scale = jnp.einsum("mbl,m->bl", modality_masks.astype(delta.dtype),
                                 post)
        delta = delta * token_scale[..., None]
    return delta.astype(x.dtype)


def lora_delta(x: Array, lora_a0: Array, lora_b: Array, scale: float) -> Array:
    """Plain text-adapter LoRA path: ``B(A0(x) * scale)``.

    This is the single-token decode fast path (reference ``lora.py:373-381``)
    and the masks-None fallback (``layer.py:672-678``).  For the VT flavor the
    scale goes after B (``layer.py:677``) — mathematically identical since it
    is a scalar.
    """
    a = jnp.einsum("...d,dr->...r", x, lora_a0,
                   preferred_element_type=jnp.float32,
                       precision="highest")
    delta = jnp.einsum("...r,rd->...d", a * jnp.float32(scale), lora_b,
                       preferred_element_type=jnp.float32,
                       precision="highest")
    return delta.astype(x.dtype)


def decode_scale(spec: MokaSpec) -> float:
    """The total text-path scale used at single-token decode steps."""
    post = 1.0 if spec.post_scales is None else spec.post_scales[0]
    return spec.pre_scale * post


def moka_linear(x: Array, w: Array, lora_a: Array, lora_b: Array,
                modality_masks: Array | None, question_mask: Array | None,
                spec: MokaSpec, *, bias: Array | None = None,
                dropout_rng: Array | None = None) -> Array:
    """Frozen base matmul + MokA delta.

    ``w`` is stored (d_in, d_out).  When masks are ``None`` (decode steps),
    only the text adapter applies (reference decode fast path).
    """
    y = jnp.einsum("...d,df->...f", x, w)
    if bias is not None:
        y = y + bias
    if modality_masks is None:
        y = y + lora_delta(x, lora_a[0], lora_b, decode_scale(spec))
    else:
        y = y + moka_delta(x, lora_a, lora_b, modality_masks, question_mask,
                           spec, dropout_rng=dropout_rng)
    return y
