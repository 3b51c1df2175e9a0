"""LLaMA-2 decoder with MokA adapter slots — pure-functional, scan-over-layers.

Replaces the reference's two transformers forks
(``AudioVisualText/models/modeling_llama.py``,
``VisualText/modified_models/modeling_llama.py``): every one of the seven
projections (q/k/v/o/gate/up/down) goes through an adapter hook carrying the
token-level modality masks (reference ``modeling_llama.py:326-328,384,222-226``).

TPU-first design:
  * layer parameters are stacked along a leading ``n_layers`` axis and the
    decoder is a single ``lax.scan`` — one compiled layer body regardless of
    depth, fast compiles, and ``jax.checkpoint`` per scan step gives the
    reference's gradient-checkpointing (``modeling_llama.py:719-733``) for
    free, masks included;
  * the frozen base lives in bf16 and is *closed over* (not differentiated):
    only adapter/projector grads exist, which is the whole ZeRO story here;
  * KV cache is a pytree carried functionally; prefill writes [0, L), decode
    steps write one slot — no GenerationMixin fork needed (the reference
    forked 14k LoC of HF internals for this, ``models/my_utils.py``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from moka_tpu.core.config import LlamaConfig
from moka_tpu.ops.attention import causal_bias, mha
from moka_tpu.ops.moka import MokaSpec, lora_delta, moka_delta, decode_scale
from moka_tpu.ops.rope import apply_rope, rope_cos_sin

Array = jax.Array

PROJ_DIMS = {  # name -> (d_in_attr, d_out_attr) resolved in init
    "q": ("dim", "q_out"), "k": ("dim", "kv_out"), "v": ("dim", "kv_out"),
    "o": ("q_out", "dim"), "gate": ("dim", "intermediate"),
    "up": ("dim", "intermediate"), "down": ("intermediate", "dim"),
}


_PROJ_INDEX = {name: i for i, name in enumerate(PROJ_DIMS)}

# projections grouped by the input tensor they read (q/k/v: the attn-norm
# output; gate/up: the mlp-norm output) — used by
# MokaSpec.dropout_shared_masks to fold one dropout rng per GROUP so XLA
# CSE collapses the identical dropout chains (see moka.py)
_PROJ_GROUP = {"q": 0, "k": 0, "v": 0, "o": 1, "gate": 2, "up": 2,
               "down": 3}


def _proj_shapes(cfg: LlamaConfig) -> dict[str, tuple[int, int]]:
    dims = {"dim": cfg.dim, "q_out": cfg.n_heads * cfg.head_dim,
            "kv_out": cfg.n_kv_heads * cfg.head_dim,
            "intermediate": cfg.intermediate}
    return {k: (dims[a], dims[b]) for k, (a, b) in PROJ_DIMS.items()}


def init_llama_params(rng: Array, cfg: LlamaConfig,
                      dtype=jnp.bfloat16) -> dict:
    """Random init (normal 0.02, HF-style); real weights come from the
    checkpoint importer."""
    shapes = _proj_shapes(cfg)
    n = cfg.n_layers
    keys = iter(jax.random.split(rng, len(shapes) + 3))

    def w(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dtype)

    layers = {name: w(next(keys), (n, *shapes[name])) for name in shapes}
    layers["attn_norm"] = jnp.ones((n, cfg.dim), dtype)
    layers["mlp_norm"] = jnp.ones((n, cfg.dim), dtype)
    return {
        "embed": w(next(keys), (cfg.vocab_size, cfg.dim)),
        "layers": layers,
        "final_norm": jnp.ones((cfg.dim,), dtype),
        "lm_head": w(next(keys), (cfg.dim, cfg.vocab_size)),
    }


def init_moka_adapters(rng: Array, cfg: LlamaConfig, spec: MokaSpec,
                       dtype=jnp.float32,
                       targets: tuple[str, ...] = tuple(PROJ_DIMS)) -> dict:
    """Per-layer MokA params for each target projection, layer-stacked.

    Matches the reference injection of all seven projections
    (``finetune.py:79-80``) with kaiming-uniform A / zero B
    (``lora.py:343-348``)."""
    import math
    shapes = _proj_shapes(cfg)
    n = cfg.n_layers
    out = {}
    keys = jax.random.split(rng, len(targets))
    for key, name in zip(keys, targets):
        d_in, d_out = shapes[name]
        bound = 1.0 / math.sqrt(d_in)
        a = jax.random.uniform(
            key, (n, spec.num_modalities, d_in, spec.rank), jnp.float32,
            minval=-bound, maxval=bound).astype(dtype)
        b = jnp.zeros((n, spec.rank, d_out), dtype)
        out[name] = {"a": a, "b": b}
    return {"layers": out}


def rmsnorm(x: Array, w: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MaskBundle:
    """Token-level modality masks for one batch (static shapes).

    modality: (M, b, L) 0/1 — index 0 is text; question: (b, L) 0/1."""
    modality: Array
    question: Array


def _apply_proj(name: str, x: Array, base_w, adapters: dict | None,
                spec: MokaSpec | None, masks: MaskBundle | None,
                dropout_rng: Array | None, fused: bool = False,
                a8: bool | str = False,
                save_q8: tuple = ("int8", ())) -> Array:
    from jax.ad_checkpoint import checkpoint_name
    from moka_tpu.ops.quant import is_quantized, qmatmul, qmatmul_a8

    def tag(y: Array) -> Array:
        # save_q8 = (mode, names): store this projection's remat residual
        # as per-token int8 (+fp32 scales) or fp8-e4m3 instead of bf16 —
        # halves save-set bytes (quant.q8_roundtrip / fp8_roundtrip);
        # downstream consumes the dequantized value.
        mode, names = save_q8
        if name in names:
            from moka_tpu.ops.quant import fp8_roundtrip, q8_roundtrip
            fn = fp8_roundtrip if mode == "fp8" else q8_roundtrip
            return fn(f"proj_{name}", y)
        return checkpoint_name(y, f"proj_{name}")
    if a8 and is_quantized(base_w) and x.ndim == 3:
        # W4A8/W8A8: int8 activations ride the MXU's int8 path.  a8=True
        # keeps backward on the bf16 straight-through dX; a8="full" also
        # quantizes the cotangent so the dX dots run int8 (quant.py).
        y = qmatmul_a8(x, base_w, bwd_a8=(a8 == "full"))
    else:
        y = qmatmul(x, base_w)
    if adapters is None or name not in adapters:
        return tag(y)
    a, b = adapters[name]["a"], adapters[name]["b"]
    if masks is None:
        # decode steps / text-only: text-adapter fast path (lora.py:373-381)
        return y + lora_delta(x, a[0], b, decode_scale(spec))
    rng = None
    if dropout_rng is not None and spec.dropout_rate > 0:
        idx = _PROJ_GROUP[name] if spec.dropout_shared_masks \
            else _PROJ_INDEX[name]
        rng = jax.random.fold_in(dropout_rng, idx)
    if fused:
        # LoRA dropout applies only to the adapter's input (lora.py:371,
        # 403): apply it outside the kernel, keep the base matmul on the
        # clean x — gradients flow through the dropout mask via the VJP.
        from moka_tpu.ops.moka_pallas import moka_delta_fused
        x_d = x
        if rng is not None:
            from moka_tpu.ops.moka import lora_dropout
            x_d = lora_dropout(x, rng, spec.dropout_rate)
        return tag(
            y + moka_delta_fused(x_d, a, b, masks.modality, masks.question,
                                 spec))
    return tag(
        y + moka_delta(x, a, b, masks.modality, masks.question, spec,
                       dropout_rng=rng))


def _decoder_layer(cfg: LlamaConfig, spec: MokaSpec | None, use_flash: bool,
                   use_fused_moka: bool, paged_decode: bool,
                   a8_dots: bool | str, save_q8: tuple,
                   context_parallel, host_stream,
                   h: Array, layer: dict, adapters: dict | None,
                   masks: MaskBundle | None, bias: Array | None,
                   attn_mask: Array | None,
                   cos: Array, sin: Array,
                   cache_k: Array | None, cache_v: Array | None,
                   cache_index: Array | None,
                   dropout_rng: Array | None,
                   layer_idx: Array | None = None):
    """One decoder block. Returns (h, new_k_cache, new_v_cache).

    Cached mode: ``cache_k/v`` are either the per-layer slices (b, S, K, hd)
    — legacy scan path — or, when ``layer_idx`` is given, the FULL stacked
    cache (N, b, S, K, hd) updated in place at (layer_idx, :, pos) so a
    fori_loop carry aliases the buffer instead of copying it every layer
    (the copy made decode ~3x slower than the HBM bound)."""
    b, L, _ = h.shape
    hd, H, K = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads

    if host_stream is not None:
        # stream this layer's weights host->device INSIDE the remat region:
        # the backward re-DMAs them instead of the scan stacking per-layer
        # device copies as residuals (which would hold the whole base in
        # HBM and defeat the offload)
        layer = jax.device_put(layer, host_stream["layers"])

    proj = functools.partial(_apply_proj, adapters=adapters, spec=spec,
                             masks=masks, dropout_rng=dropout_rng,
                             fused=use_fused_moka, a8=a8_dots,
                             save_q8=save_q8)

    x = rmsnorm(h, layer["attn_norm"], cfg.rms_eps)
    q = proj("q", x=x, base_w=layer["q"]).reshape(b, L, H, hd)
    k = proj("k", x=x, base_w=layer["k"]).reshape(b, L, K, hd)
    v = proj("v", x=x, base_w=layer["v"]).reshape(b, L, K, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache_k is not None and layer_idx is not None:
        # full-cache in-place write + per-layer read (int8 caches quantize
        # the new k/v on the fly — _kv_update)
        start = (layer_idx, 0, cache_index, 0, 0)
        cache_k = _kv_update(cache_k, k, start)
        cache_v = _kv_update(cache_v, v, start)
        if paged_decode and L == 1:
            # length-aware Pallas kernel: reads only valid cache blocks
            from moka_tpu.ops.paged_decode import paged_decode_attention
            attn = paged_decode_attention(
                q, cache_k, cache_v, attn_mask, layer_idx,
                cache_index + 1).reshape(b, L, H * hd)
            h = h + proj("o", x=attn, base_w=layer["o"])
            x = rmsnorm(h, layer["mlp_norm"], cfg.rms_eps)
            gate = proj("gate", x=x, base_w=layer["gate"])
            up = proj("up", x=x, base_w=layer["up"])
            act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            h = h + proj("down", x=act, base_w=layer["down"])
            return h, cache_k, cache_v
        k_all = _kv_layer(cache_k, layer_idx, q.dtype)
        v_all = _kv_layer(cache_v, layer_idx, q.dtype)
    elif cache_k is not None:
        # write current k/v into the cache at [cache_index, cache_index+L)
        # (legacy per-layer path; plain caches only)
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k.astype(cache_k.dtype), (0, cache_index, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v.astype(cache_v.dtype), (0, cache_index, 0, 0))
        k_all, v_all = cache_k, cache_v
    else:
        k_all, v_all = k, v

    if context_parallel is not None and cache_k is None:
        # context parallelism: sequence sharded over a mesh axis, k/v
        # rotated around the ICI ring (the modality masks and the MokA
        # rank attention stay under GSPMD auto-sharding — the (b, L, r)
        # question keys are tiny and all-gather for free).  With use_flash
        # each visited shard runs through the Pallas flash kernel, so no
        # per-shard (Lq, Lk) dense score tensor exists — at the long
        # contexts CP exists for, the dense block is the local memory bound.
        from moka_tpu.parallel.ring_attention import (
            make_ring_attention, make_ring_flash_attention)
        cp_mesh, cp_axis = context_parallel
        ring = (make_ring_flash_attention if use_flash
                else make_ring_attention)(cp_mesh, cp_axis)
        attn = ring(q, k_all.astype(q.dtype), v_all.astype(q.dtype),
                    attn_mask)
    elif use_flash:
        from moka_tpu.ops.flash_attention import flash_mha
        qoff = cache_index if cache_index is not None else 0
        attn = flash_mha(q, k_all.astype(q.dtype), v_all.astype(q.dtype),
                         attn_mask, q_offset=qoff)
    else:
        attn = mha(q, k_all.astype(q.dtype), v_all.astype(q.dtype), bias)
    from jax.ad_checkpoint import checkpoint_name
    attn = checkpoint_name(attn.reshape(b, L, H * hd), "attn_out")
    h = h + proj("o", x=attn, base_w=layer["o"])

    x = rmsnorm(h, layer["mlp_norm"], cfg.rms_eps)
    gate = proj("gate", x=x, base_w=layer["gate"])
    up = proj("up", x=x, base_w=layer["up"])
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    h = h + proj("down", x=act, base_w=layer["down"])
    return h, cache_k, cache_v


def _remat_policy(name: str | None):
    """Named rematerialization policies for the per-layer ``jax.checkpoint``.

    The reference's grad checkpointing recomputes the full layer
    (``modeling_llama.py:719-733``); with a frozen base the recompute is
    almost entirely the 7 projection matmuls (~2P of a 6P/token step —
    attention is negligible at L~1k), so saving projection outputs trades
    HBM for up to 1.5x step throughput where memory allows.

      None / "full":  save only layer inputs (max memory savings)
      "attn":         save the attention output (skips flash-fwd recompute)
      "qkv":          + q/k/v projection outputs
      "mlp":          attn + gate/up outputs (the two largest matmuls)
      "proj":         all 7 projection outputs + attention (min recompute)
      "dots":         jax built-in dots_saveable
    """
    if name is None or name == "full":
        return None
    save = jax.checkpoint_policies.save_only_these_names
    if name == "attn":
        return save("attn_out")
    if name == "qkv":
        return save("attn_out", "proj_q", "proj_k", "proj_v")
    if name == "qkvod":
        # all the narrow (d-out = dim) projections; skips ~55% of the
        # recompute for ~6 GB at 7B b4xL1024 — the widest save set that
        # still fits one 16 GB chip beside the int8 base
        return save("attn_out", "proj_q", "proj_k", "proj_v", "proj_o",
                    "proj_down")
    if name == "qkvod_lse":
        # qkvod with the flash residuals saved in place of attn_out (see
        # proj_nokv_lse): same memory +lse, no flash-fwd recompute in bwd
        return save("flash_out", "flash_lse", "proj_q", "proj_k", "proj_v",
                    "proj_o", "proj_down")
    if name == "mlp":
        return save("attn_out", "proj_gate", "proj_up")
    if name == "proj":
        return save("attn_out", *(f"proj_{n}" for n in PROJ_DIMS))
    if name == "proj_nokv":
        # proj minus the k/v saves: k/v are the cheapest projections to
        # recompute (narrow matmuls off the saved layer input) and dropping
        # them shaves ~2 GB at 7B b4xL1024 — the widest set that fits one
        # 16 GB chip beside an int4 base
        return save("attn_out", "proj_q", "proj_o", "proj_down",
                    "proj_gate", "proj_up")
    if name == "proj_nokv_lse":
        # proj_nokv, but saving the flash-attention custom-VJP residuals
        # (kernel output pre-reshape + per-row logsumexp) INSTEAD of
        # attn_out: the backward reuses them rather than re-running the
        # flash forward kernel, and attn_out is a free reshape of
        # flash_out.  lse is (B,H,L) fp32 — tiny.
        return save("flash_out", "flash_lse", "proj_q", "proj_o",
                    "proj_down", "proj_gate", "proj_up")
    if name == "proj_noqkv":
        return save("attn_out", "proj_o", "proj_down", "proj_gate",
                    "proj_up")
    if name == "proj_lse":
        # ALL 7 projection outputs + the flash residuals: zero projection
        # recompute in backward (only rmsnorm/rope/elementwise re-run).
        # Exceeds one 16 GB chip beside an int4 base in bf16; fits with
        # the int8-quantized save set (save_q8) — measured r5.
        return save("flash_out", "flash_lse",
                    *(f"proj_{n}" for n in PROJ_DIMS))
    if name == "dots":
        return jax.checkpoint_policies.dots_saveable
    raise ValueError(f"unknown remat policy {name!r}")


# The projection outputs each named policy saves — used by ``save_q8=True``
# to quantize exactly the saved residuals (quantizing an unsaved projection
# would add forward noise for zero memory/traffic benefit).
_POLICY_SAVED_PROJS = {
    "qkv": ("q", "k", "v"),
    "qkvod": ("q", "k", "v", "o", "down"),
    "qkvod_lse": ("q", "k", "v", "o", "down"),
    "mlp": ("gate", "up"),
    "proj": tuple(PROJ_DIMS),
    "proj_nokv": ("q", "o", "down", "gate", "up"),
    "proj_nokv_lse": ("q", "o", "down", "gate", "up"),
    "proj_noqkv": ("o", "down", "gate", "up"),
    "proj_lse": tuple(PROJ_DIMS),
}


def _resolve_save_q8(save_q8, remat_policy: str | None) -> tuple:
    """-> (mode, proj_names).  True/"fp8" derive the set from the policy
    (int8 / fp8-e4m3 storage); a tuple of proj names selects explicitly
    (int8, or fp8 with a leading "fp8" element)."""
    if not save_q8:
        return ("int8", ())
    if save_q8 is True:
        return ("int8", _POLICY_SAVED_PROJS.get(remat_policy, ()))
    if save_q8 == "fp8":
        return ("fp8", _POLICY_SAVED_PROJS.get(remat_policy, ()))
    names = tuple(save_q8)
    if names and names[0] == "fp8":
        return ("fp8", names[1:])
    return ("int8", names)


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16, quantized: bool = False) -> dict:
    """``quantized=True`` stores the cache int8 with per-(token, head) fp32
    scales — 2x fewer cache bytes read per decode step.  At 7B decode the
    step is weights+cache HBM-bandwidth-bound (PERFORMANCE.md: 4.5 GB params
    + 2.2 GB cache / 819 GB/s), so halving cache traffic is the largest
    single decode lever.  Each k/v side becomes ``{"q": int8, "s": fp32}``;
    every cache consumer (eager, flash-prefill, paged block loop, engine
    insert/compact) handles both layouts."""
    shape = (cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    if quantized:
        sshape = shape[:-1] + (1,)
        side = lambda: {"q": jnp.zeros(shape, jnp.int8),
                        "s": jnp.ones(sshape, jnp.float32)}
        return {"k": side(), "v": side(),
                "length": jnp.zeros((), jnp.int32)}
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype),
            "length": jnp.zeros((), jnp.int32)}


def _kv_quantize(x: Array) -> tuple[Array, Array]:
    """Per-(token, head) symmetric int8 over head_dim: (..., hd) ->
    (int8 values, fp32 scale (..., 1)).  All-zero rows quantize exactly."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.where(ax == 0, 1.0, ax / 127.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def _kv_update(side, new: Array, start) -> Array | dict:
    """Write ``new`` (b, L, K, hd) into one cache side at 5-d ``start``
    (layer, 0, pos, 0, 0); quantizes on the fly for int8 caches."""
    if isinstance(side, dict):
        q, s = _kv_quantize(new)
        return {"q": jax.lax.dynamic_update_slice(side["q"], q[None], start),
                "s": jax.lax.dynamic_update_slice(side["s"], s[None], start)}
    return jax.lax.dynamic_update_slice(side, new[None].astype(side.dtype),
                                        start)


def _kv_layer(side, layer_idx, dtype) -> Array:
    """Read one layer's (b, S, K, hd) slice, dequantized to ``dtype``.
    The int8 values and scales are sliced separately so HBM reads stay at
    one byte per element; XLA fuses the dequant multiply into the consumer
    dot exactly as it does for quantized weights."""
    take = functools.partial(jax.lax.dynamic_index_in_dim,
                             index=layer_idx, axis=0, keepdims=False)
    if isinstance(side, dict):
        return (take(side["q"]).astype(jnp.float32)
                * take(side["s"])).astype(dtype)
    return take(side).astype(dtype)


def kv_cache_shape(cache: dict) -> tuple:
    """(n_layers, batch, S, K, hd) for plain or quantized caches."""
    k = cache["k"]
    return (k["q"] if isinstance(k, dict) else k).shape


def forward(base: dict, cfg: LlamaConfig, *,
            adapters: dict | None = None, spec: MokaSpec | None = None,
            tokens: Array | None = None, inputs_embeds: Array | None = None,
            masks: MaskBundle | None = None,
            attn_mask: Array | None = None,
            positions: Array | None = None,
            cache: dict | None = None,
            remat: bool = False,
            remat_policy: str | None = None,
            dropout_rng: Array | None = None,
            logits: bool = True,
            use_flash: bool = False,
            use_fused_moka: bool = False,
            paged_decode: bool = False,
            a8_dots: bool | str = False,
            save_q8: bool | tuple = False,
            context_parallel=None,
            host_stream: dict | None = None):
    """Full decoder forward.

    attn_mask: (b, S) valid-key mask over the *attention span* (the current
      sequence for cache-less calls; the whole cache for cached calls).
    positions: (b, L) RoPE positions of the current tokens (defaults to
      arange).
    context_parallel: optional (Mesh, axis_name) — shard the sequence over
      that mesh axis and run attention as a k/v ring over ICI
      (``parallel/ring_attention.py``).  Training/prefill only (no cache);
      composes with remat and the MokA masks.  Supersedes ``use_flash``.
    save_q8: quantize the remat save set — the saved projection residuals
      are stored as per-token int8 + fp32 scales instead of bf16 (half the
      residual HBM and save/read traffic; ``ops.quant.q8_roundtrip``).
      ``True`` derives the set from ``remat_policy`` (exactly its saved
      projections); a tuple of proj names ("gate", "up", ...) selects
      explicitly; ``"fp8"`` (or a tuple led by "fp8") stores fp8-e4m3
      instead — one convert, no scale tensors (``quant.fp8_roundtrip``).
      Downstream consumes the dequantized values — an
      O(1/127) per-token noise term of the same kind the a8 dots inject,
      bounded by the 1B quality anchor's ``sq8`` arm.
    host_stream: when the ``base`` tree lives in ``pinned_host`` memory
      (``parallel.sharding.shard_params(host_offload=True)``), pass
      ``parallel.sharding.stream_shardings(mesh, base)``: each layer's
      weights are DMA'd host->device inside the layer loop (peak HBM = one
      layer of the base) — the ZeRO-3-param-offload analog for 100B-class
      bases (``zero_stage3_config_100b_1e7_offload.json:13-20``).
    Returns (logits_or_hidden, new_cache).
    """
    if context_parallel is not None and cache is not None:
        raise ValueError("context_parallel is a training/prefill path; "
                         "cached decode is not sequence-sharded")
    if inputs_embeds is None:
        table = base["embed"] if host_stream is None else \
            jax.device_put(base["embed"], host_stream["embed"])
        inputs_embeds = jnp.take(table, tokens, axis=0)
    h = inputs_embeds
    b, L, _ = h.shape

    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(L), (b, L))
    # dynamic-NTK scales by the TOTAL attended length (reference
    # DynamicNTKScalingRotaryEmbedding uses kv_seq_len); note that keys
    # cached under one theta are not reusable under another — the reference
    # resets its cos/sin cache on overflow, so callers should not mix
    # pre/post-overflow cache entries either.
    total_len = cache["length"] + L if cache is not None else L
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                            cfg.rope_scaling, seq_len=total_len,
                            max_seq_len=cfg.max_seq_len)

    if cache is not None:
        S = kv_cache_shape(cache)[2]
        cache_index = cache["length"]
        if attn_mask is None:
            raise ValueError("cached forward needs attn_mask over the cache")
        bias = None if use_flash else causal_bias(attn_mask, L, S,
                                                  q_offset=cache_index)
    else:
        S = L
        cache_index = None
        if attn_mask is None:
            attn_mask = jnp.ones((b, L), jnp.int32)
        bias = None if use_flash else causal_bias(attn_mask, L, L)

    layer_fn = functools.partial(_decoder_layer, cfg, spec, use_flash,
                                 use_fused_moka, paged_decode, a8_dots,
                                 _resolve_save_q8(save_q8, remat_policy),
                                 context_parallel, host_stream)
    if remat:
        layer_fn = jax.checkpoint(
            layer_fn, static_argnums=(), policy=_remat_policy(remat_policy))

    if dropout_rng is not None:
        layer_rngs = jax.random.split(dropout_rng, cfg.n_layers)
    else:
        layer_rngs = None

    new_cache = None
    if cache is not None:
        # fori_loop with the FULL cache as carry: XLA aliases the buffer in
        # place (a scan would stack fresh per-layer cache copies — GBs of
        # HBM traffic per decode step)
        def body(i, carry):
            h, ck, cv = carry
            take = functools.partial(jax.lax.dynamic_index_in_dim,
                                     index=i, axis=0, keepdims=False)
            layer = jax.tree.map(take, base["layers"])
            ad = jax.tree.map(take, adapters["layers"]) \
                if adapters is not None else None
            rng = take(layer_rngs) if layer_rngs is not None else None
            h, ck, cv = layer_fn(h, layer, ad, masks, bias, attn_mask, cos,
                                 sin, ck, cv, cache_index, rng, layer_idx=i)
            return h, ck, cv

        h, new_k, new_v = jax.lax.fori_loop(
            0, cfg.n_layers, body, (h, cache["k"], cache["v"]))
        new_cache = {"k": new_k, "v": new_v, "length": cache["length"] + L}
    else:
        xs = {"layer": base["layers"]}
        if adapters is not None:
            xs["ad"] = adapters["layers"]
        if layer_rngs is not None:
            xs["rng"] = layer_rngs

        def scan_body(h, x):
            h, _, _ = layer_fn(h, x["layer"], x.get("ad"), masks, bias,
                               attn_mask, cos, sin, None, None, None,
                               x.get("rng"))
            return h, None

        h, _ = jax.lax.scan(scan_body, h, xs)

    final_norm, lm_head = base["final_norm"], base["lm_head"]
    if host_stream is not None:
        final_norm = jax.device_put(final_norm, host_stream["final_norm"])
        if logits:
            lm_head = jax.device_put(lm_head, host_stream["lm_head"])
    h = rmsnorm(h, final_norm, cfg.rms_eps)
    if logits:
        out = head_logits(h, lm_head)
    else:
        out = h
    return out, new_cache


def head_logits(h: Array, lm_head, a8: bool | str = False) -> Array:
    """fp32 logits = h @ lm_head for a plain or int8/int4-quantized head.

    ``a8`` (quantized heads only) quantizes h per token and runs the dot on
    the MXU int8 path (``qmatmul_a8``); "full" also quantizes the backward
    cotangent.  Without a8, the dequant fuses into the dot operand."""
    from moka_tpu.ops.quant import dequantize, is_quantized, qmatmul_a8
    if is_quantized(lm_head):
        if a8:
            return qmatmul_a8(h, lm_head, bwd_a8=(a8 == "full"),
                              out_dtype=jnp.float32)
        lm_head = dequantize(lm_head, dtype=h.dtype)
    return jnp.einsum("bld,dv->blv", h, lm_head,
                      preferred_element_type=jnp.float32)


def cross_entropy_loss(logits: Array, labels: Array,
                       ignore_index: int = -100) -> Array:
    """Shift-by-one CE over supervised positions
    (``modeling_llama.py:862-879``)."""
    logits = logits[:, :-1, :].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != ignore_index
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def chunked_cross_entropy(h: Array, lm_head, labels: Array,
                          ignore_index: int = -100,
                          chunk: int = 128,
                          a8: bool | str = False,
                          pallas_ce: bool = False,
                          rows_layout: bool = False) -> Array:
    """Shift-by-one CE fused with the lm_head projection, scanned over
    sequence chunks so the full fp32 (b, L, V) logits tensor never
    materializes (at the reference recipe's shapes that tensor is ~0.5 GB
    and pure HBM traffic).  Each chunk is rematerialized in the backward.
    Numerically identical to ``forward(logits=True)`` + cross_entropy_loss.

    ``lm_head`` may be an int8/int4-quantized dict (``quantize_llama_base``
    head_bits): the scan then re-reads half the head bytes, and with ``a8``
    the chunk dots ride the MXU int8 path (``head_logits``).

    ``pallas_ce`` (int8 heads only) routes through the Pallas fused
    lm_head+CE kernel (``ops/fused_ce.py``): logits never touch HBM at
    all — the chunk scan's per-chunk logits round-trips disappear.

    ``rows_layout``: scan over contiguous row blocks of the FLATTENED
    (b*L, d) hidden instead of per-batch sequence chunks.  The shift
    happens in the labels (last position's target set to ignore), so the
    h[:, :-1] slice copy, the pad-to-chunk copy, and the
    (b,nc,chunk,d)->(nc,b,chunk,d) transpose (plus their backward
    counterparts) all disappear — every reshape is free.  Costs b extra
    ignored rows of head dot (negligible).  Numerically identical.
    """
    b, L, d = h.shape
    if rows_layout and not pallas_ce:
        targets = jnp.concatenate(
            [labels[:, 1:],
             jnp.full((b, 1), ignore_index, labels.dtype)], axis=1)
        n = b * L
        pad = (-n) % chunk
        rows = h.reshape(n, d)
        t = targets.reshape(n)
        if pad:
            rows = jnp.pad(rows, ((0, pad), (0, 0)))
            t = jnp.pad(t, (0, pad), constant_values=ignore_index)
        nc = (n + pad) // chunk
        rows = rows.reshape(nc, 1, chunk, d)
        t = t.reshape(nc, 1, chunk)

        @jax.checkpoint
        def one_rows(carry, xs):
            hc, tc = xs
            logits = head_logits(hc, lm_head, a8=a8)
            valid = tc != ignore_index
            safe = jnp.where(valid, tc, 0)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, safe[..., None], axis=-1)[..., 0]
            loss_sum, count = carry
            return (loss_sum + jnp.sum(jnp.where(valid, nll, 0.0)),
                    count + jnp.sum(valid)), None

        (loss_sum, count), _ = jax.lax.scan(
            one_rows, (jnp.zeros((), jnp.float32),
                       jnp.zeros((), jnp.int32)), (rows, t))
        return loss_sum / jnp.maximum(count, 1)
    if pallas_ce:
        from moka_tpu.ops.quant import is_quantized
        if not (is_quantized(lm_head) and "w_i8" in lm_head):
            raise ValueError("pallas_ce requires an int8-quantized lm_head")
        from moka_tpu.ops.fused_ce import fused_ce_loss
        rows = h[:, :-1].reshape(b * (L - 1), d)
        t = labels[:, 1:].reshape(b * (L - 1))
        return fused_ce_loss(rows, lm_head, t, ignore_index=ignore_index)
    h = h[:, :-1]
    targets = labels[:, 1:]
    n = L - 1
    pad = (-n) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)),
                          constant_values=ignore_index)
    nc = (n + pad) // chunk
    h = h.reshape(b, nc, chunk, d).transpose(1, 0, 2, 3)
    targets = targets.reshape(b, nc, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def one(carry, xs):
        hc, tc = xs
        logits = head_logits(hc, lm_head, a8=a8)
        valid = tc != ignore_index
        safe = jnp.where(valid, tc, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        loss_sum, count = carry
        return (loss_sum + jnp.sum(jnp.where(valid, nll, 0.0)),
                count + jnp.sum(valid)), None

    (loss_sum, count), _ = jax.lax.scan(
        one, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (h, targets))
    return loss_sum / jnp.maximum(count, 1)
