"""Batched greedy generation: multimodal prefill + text-only decode scan.

This ~100-line module replaces the reference's forked HF generation stack
(``AudioVisualText/models/my_utils.py`` 4,729 LoC + ``my_modeling_utils.py``
5,007 LoC + ``check_utils.py``): the only reason those forks exist is to
thread the modality-mask list through ``generate()`` into the first forward
(``my_utils.py:1335-1341,2666-2677``).  Here the masks are prefill arguments
and the decode step statically uses the text-adapter path
(``lora.py:373-381``), so nothing needs forking.

Prompts must be LEFT-padded (as the reference's AVT inference batches are,
``unified_arch.py:278-317``): every sample's last prompt token then sits at
the same static index and the whole decode loop is one ``lax.scan`` with no
data-dependent shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from moka_tpu.core.config import LlamaConfig
from moka_tpu.models import llama
from moka_tpu.ops.moka import MokaSpec

Array = jax.Array


def positions_from_mask(attn_mask: Array) -> Array:
    """HF-style: cumsum(mask)-1, clipped at 0 (pad rows get position 0)."""
    pos = jnp.cumsum(attn_mask, axis=-1) - 1
    return jnp.maximum(pos, 0)


def paged_decode_auto(cfg: LlamaConfig, capacity: int,
                      kv_quant: bool = False) -> bool:
    """Measured gate for the length-aware decode block loop (PERFORMANCE.md
    decode table): it wins only where the cache read dominates the step.
    3B: +9% at S>=1024, -5% at S=512.  7B: ~tied-to-slightly-worse at
    S=1024 (weight reads dominate), so large models need a longer cache
    before the loop pays.

    int8 caches (``kv_quant``) always take the block loop on TPU: the eager
    path materializes each layer's dequantized cache slice (measured −12%
    at 7B S1024) while the block loop reads int8 directly and folds the
    scales into the online-softmax accumulators (+5.5% at S≈1k, +9% at
    S≈1.4k — PERFORMANCE.md r4 decode table)."""
    if jax.default_backend() != "tpu":
        return False
    if kv_quant:
        return True
    if cfg.dim >= 4096:  # 7B-class and up
        return capacity >= 2048
    return capacity >= 1024


@functools.partial(jax.jit, static_argnames=("cfg", "spec", "max_new_tokens",
                                             "eos_id", "pad_id", "use_flash",
                                             "paged_decode", "kv_quant"))
def _greedy_generate(base: dict, adapters: dict | None, *,
                     cfg: LlamaConfig, spec: MokaSpec | None,
                     inputs_embeds: Array, prompt_mask: Array,
                     masks: llama.MaskBundle | None,
                     max_new_tokens: int, eos_id: int, pad_id: int = 0,
                     use_flash: bool = False, paged_decode: bool = False,
                     kv_quant: bool = False,
                     sample_rng: Array | None = None,
                     temperature: Array | None = None,
                     top_k: Array | None = None,
                     top_p: Array | None = None):
    b, L, _ = inputs_embeds.shape

    def pick(step_logits: Array, t) -> Array:
        if sample_rng is None:
            return jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
        from moka_tpu.eval.sampling import sample_tokens
        return sample_tokens(step_logits, jax.random.fold_in(sample_rng, t),
                             temperature, top_k, top_p)
    S = L + max_new_tokens
    if paged_decode:
        # the paged kernel DMAs fixed-size blocks; round the allocation up
        # (invalid tail slots are masked by cache_mask/length)
        S = -(-S // 256) * 256

    cache = llama.init_kv_cache(cfg, b, S, dtype=inputs_embeds.dtype,
                                quantized=kv_quant)
    # mask covers the FULL allocation (S may exceed L+max_new_tokens when
    # rounded up for the paged kernel; the tail stays masked off)
    cache_mask = jnp.pad(prompt_mask, ((0, 0), (0, S - L)))
    pos = positions_from_mask(prompt_mask)

    logits, cache = llama.forward(
        base, cfg, adapters=adapters, spec=spec,
        inputs_embeds=inputs_embeds, masks=masks,
        attn_mask=cache_mask, positions=pos, cache=cache,
        use_flash=use_flash)  # prefill only; single-token steps stay eager
    next_tok = pick(logits[:, -1, :], 0)

    n_prompt = jnp.sum(prompt_mask, axis=-1)  # (b,) real prompt lengths

    def step(carry, t):
        tok, cache, cache_mask, done = carry
        cache_mask = cache_mask.at[:, L + t].set(1)
        step_pos = (n_prompt + t)[:, None]
        embeds = jnp.take(base["embed"], tok[:, None], axis=0)
        logits, cache = llama.forward(
            base, cfg, adapters=adapters, spec=spec,
            inputs_embeds=embeds, masks=None,
            attn_mask=cache_mask, positions=step_pos, cache=cache,
            paged_decode=paged_decode)
        new_tok = pick(logits[:, -1, :], t + 1)
        out = jnp.where(done, pad_id, tok)
        done = done | (tok == eos_id)
        new_tok = jnp.where(done, eos_id, new_tok)
        return (new_tok, cache, cache_mask, done), out

    done0 = jnp.zeros((b,), bool)
    (_, _, _, _), toks = jax.lax.scan(
        step, (next_tok, cache, cache_mask, done0),
        jnp.arange(max_new_tokens))
    return toks.T  # (b, max_new_tokens)


def greedy_generate(base: dict, adapters: dict | None, *,
                    cfg: LlamaConfig, spec: MokaSpec | None,
                    inputs_embeds: Array, prompt_mask: Array,
                    masks: llama.MaskBundle | None,
                    max_new_tokens: int, eos_id: int, pad_id: int = 0,
                    use_flash: bool | None = None,
                    paged_decode: bool | None = None,
                    kv_quant: bool = False):
    """Greedy decode (the eval drivers all use greedy generate —
    ``mmbench.py:641``, ``inference_cut.py:66``).

    Args:
      inputs_embeds: (b, L, d) left-padded prompt embeddings (multimodal
        features already spliced in).
      prompt_mask: (b, L) 0/1 valid-prompt-token mask.
      masks: modality masks over the prompt (or None for text-only).
      use_flash: Pallas flash attention for the prefill (measured faster at
        eval shapes — PERFORMANCE.md decode table).  ``None`` = auto: on
        for TPU backends, off elsewhere (the kernel needs interpret mode on
        CPU).
      paged_decode: length-aware block attention for the decode steps
        (reads only the valid cache prefix — ``ops/paged_decode.py``;
        measured +9% decode throughput at 3B/b8/S1024, more at longer
        caches).  ``None`` = auto via ``paged_decode_auto`` — the same
        measured capacity/model-size gate the serving engine uses (the
        block loop only pays where the cache read dominates the step).
      kv_quant: store the KV cache int8 with per-(token, head) scales
        (``llama.init_kv_cache(quantized=True)``) — halves cache HBM
        traffic per decode step at the cost of quantizing k/v on write.
      Returns (b, max_new_tokens) int32 tokens, pad_id after eos.
    """
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    if paged_decode is None:
        paged_decode = paged_decode_auto(
            cfg, inputs_embeds.shape[1] + max_new_tokens, kv_quant=kv_quant)
    return _greedy_generate(
        base, adapters, cfg=cfg, spec=spec, inputs_embeds=inputs_embeds,
        prompt_mask=prompt_mask, masks=masks,
        max_new_tokens=max_new_tokens, eos_id=eos_id, pad_id=pad_id,
        use_flash=use_flash, paged_decode=paged_decode, kv_quant=kv_quant)


def sample_generate(base: dict, adapters: dict | None, *,
                    cfg: LlamaConfig, spec: MokaSpec | None,
                    inputs_embeds: Array, prompt_mask: Array,
                    masks: llama.MaskBundle | None,
                    max_new_tokens: int, eos_id: int, pad_id: int = 0,
                    rng: Array | None = None,
                    temperature: Array | float = 1.0,
                    top_k: Array | int = 0,
                    top_p: Array | float = 1.0,
                    use_flash: bool | None = None,
                    paged_decode: bool | None = None,
                    kv_quant: bool = False):
    """Stochastic decode: temperature / top-k / top-p per sample.

    Mirrors the reference's HF ``generate(do_sample=True)`` path (its forked
    GenerationMixin inherits the standard TopK/TopP warpers —
    ``my_utils.py`` ``sample()``); parameters may be scalars or (b,) arrays,
    and rows with ``temperature == 0`` run greedy.  The same jitted scan as
    ``greedy_generate`` — sampling adds one warp+gumbel-argmax per step.

    ``rng=None`` falls back to ``jax.random.key(0)`` — a DETERMINISTIC
    default (every call reuses the same per-step Gumbel noise); callers
    wanting varied samples must thread a key (the CLI drivers fold a batch
    counter into ``--seed``).
    """
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    if paged_decode is None:
        paged_decode = paged_decode_auto(
            cfg, inputs_embeds.shape[1] + max_new_tokens, kv_quant=kv_quant)
    b = inputs_embeds.shape[0]
    bc = lambda x, dt: jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(x, dt)),
                                        (b,))
    return _greedy_generate(
        base, adapters, cfg=cfg, spec=spec, inputs_embeds=inputs_embeds,
        prompt_mask=prompt_mask, masks=masks,
        max_new_tokens=max_new_tokens, eos_id=eos_id, pad_id=pad_id,
        use_flash=use_flash, paged_decode=paged_decode, kv_quant=kv_quant,
        sample_rng=rng if rng is not None else jax.random.key(0),
        temperature=bc(temperature, jnp.float32),
        top_k=bc(top_k, jnp.int32), top_p=bc(top_p, jnp.float32))
