"""Int8 weight-only quantization for the frozen base (QLoRA-style).

The MokA setting freezes the 7B base entirely (``lora.py:333``) — ideal for
weight-only quantization: per-output-channel symmetric int8 halves the
frozen-weight footprint (13.5 GB bf16 -> ~6.8 GB), which is what lets the
7B flagship train/serve on a single 16 GB v5e chip.  Adapters and
projectors stay fp32; activations stay bf16; the dequantized weight exists
only as a per-layer temporary inside the jitted step.

``quantize_tree`` converts the 7 projection weights of a layer-stacked
LLaMA param tree; norms/embeddings/lm_head stay in bf16 (embedding gathers
and the fused CE consume them directly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

QUANT_KEYS = ("q", "k", "v", "o", "gate", "up", "down")


def quantize_int8(w: Array, axis: int = -2) -> dict:
    """Symmetric per-output-channel int8.

    For layer-stacked (N, d_in, d_out) weights the reduction axis is d_in
    (axis=-2), giving one scale per (layer, out-channel)."""
    a_max = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.where(a_max == 0, 1.0, a_max / 127.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return {"w_i8": q.astype(jnp.int8), "scale": scale.astype(jnp.float32)}


def quantize_int4(w: Array, axis: int = -2) -> dict:
    """Symmetric per-output-channel int4, nibble-packed along the input dim.

    The input dim is split in halves: rows [0:h) live in the low nibble,
    rows [h:2h) in the high nibble of a uint8 of half the size — so the
    unpack at use time is two sign-extends and the matmul splits along the
    contraction dim (no interleave/concat materialization).  The backend's
    native int4 dtype is stored unpacked (one byte per value) on this TPU
    generation, hence the manual packing.  Values are clipped to [-7, 7] so
    dequant is exact under the symmetric scale amax/7."""
    assert axis in (-2, w.ndim - 2), "pack along the input (contraction) dim"
    d_in = w.shape[-2]
    assert d_in % 2 == 0, f"input dim {d_in} must be even for nibble packing"
    a_max = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.where(a_max == 0, 1.0, a_max / 7.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -7, 7)
    q = q.astype(jnp.int8)
    h = d_in // 2
    lo = jax.lax.dynamic_slice_in_dim(q, 0, h, axis=-2)
    hi = jax.lax.dynamic_slice_in_dim(q, h, h, axis=-2)
    packed = ((lo & 0x0F) | (hi << 4)).astype(jnp.uint8)
    return {"w_i4": packed, "scale": scale.astype(jnp.float32)}


def unpack_int4(packed: Array) -> tuple[Array, Array]:
    """-> (lo, hi) int8 halves, each the size of ``packed``."""
    pi = jax.lax.bitcast_convert_type(packed, jnp.int8)
    lo = (pi << 4) >> 4   # arithmetic shift sign-extends the low nibble
    hi = pi >> 4
    return lo, hi


def dequantize(qw: dict, dtype=jnp.bfloat16) -> Array:
    if "w_i4" in qw:
        lo, hi = unpack_int4(qw["w_i4"])
        w = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
        return (w * qw["scale"]).astype(dtype)
    return (qw["w_i8"].astype(jnp.float32) * qw["scale"]).astype(dtype)


def is_quantized(w) -> bool:
    return isinstance(w, dict) and ("w_i8" in w or "w_i4" in w)


def qmatmul(x: Array, w, *, spec: str = "bld,df->blf") -> Array:
    """x @ w for plain / int8 / int4-packed weights.  The dequantized weight
    is a fusion-local temporary (one per layer inside the scan/loop body).

    int4: the matmul splits along the contraction dim (low-nibble rows, then
    high-nibble rows) and the per-output-channel scale applies once to the
    fp32 accumulator — XLA fuses the nibble sign-extend into the dot operand
    the same way it fuses the int8 dequant."""
    if is_quantized(w) and "w_i4" in w:
        lo, hi = unpack_int4(w["w_i4"])
        h = lo.shape[-2]
        x_lo = jax.lax.slice_in_dim(x, 0, h, axis=-1)
        x_hi = jax.lax.slice_in_dim(x, h, 2 * h, axis=-1)
        acc = (jnp.einsum(spec, x_lo, lo.astype(x.dtype),
                          preferred_element_type=jnp.float32) +
               jnp.einsum(spec, x_hi, hi.astype(x.dtype),
                          preferred_element_type=jnp.float32))
        scale = w["scale"].reshape((1,) * (acc.ndim - 1) + (-1,))
        return (acc * scale).astype(x.dtype)
    if is_quantized(w):
        w = dequantize(w, dtype=x.dtype)
    return jnp.einsum(spec, x, w)


def _a8_quantize(x: Array) -> tuple[Array, Array]:
    """Dynamic per-token symmetric int8: (b, L, d) -> int8 values + (b, L, 1)
    fp32 scale.  All-zero rows get scale 1 (quantize to exact zeros)."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.where(ax == 0, 1.0, ax / 127.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127)
    return q.astype(jnp.int8), sx


def _q8rt_impl(name: str, y: Array) -> Array:
    from jax.ad_checkpoint import checkpoint_name
    q, s = _a8_quantize(y)
    # Both carry the SAME policy name: ``save_only_these_names`` keeps every
    # value tagged with a listed name, so the int8 codes and their fp32
    # per-token scales are saved together while the bf16 activation is not.
    q = checkpoint_name(q, name)
    s = checkpoint_name(s, name)
    return (q.astype(jnp.float32) * s).astype(y.dtype)


def _fp8rt_impl(name: str, y: Array) -> Array:
    # fp8 variant: a single convert, no per-token scale reduction.  e4m3
    # clips at +-448 — fine for normalized-transformer activations (the
    # quality anchor bounds it end to end); e5m2 would trade 4x range for
    # a ~6% per-element rounding step, too coarse here.
    from jax.ad_checkpoint import checkpoint_name
    q = checkpoint_name(y.astype(jnp.float8_e4m3fn), name)
    return q.astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fp8_roundtrip(name: str, y: Array) -> Array:
    """fp8-e4m3 variant of ``q8_roundtrip``: same straight-through save-set
    quantization, but a single elementwise convert (no abs-max reduction,
    no scale tensor) — 1 byte/elem saved residuals with ~2^-3 relative
    rounding and +-448 range."""
    return _fp8rt_impl(name, y)


def _fp8rt_fwd(name, y):
    return _fp8rt_impl(name, y), None


def _fp8rt_bwd(name, _, g):
    return (g,)


fp8_roundtrip.defvjp(_fp8rt_fwd, _fp8rt_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def q8_roundtrip(name: str, y: Array) -> Array:
    """Per-token int8 quantize->dequantize with a straight-through gradient.

    Used to QUANTIZE THE REMAT SAVE SET: a projection output tagged for a
    ``jax.checkpoint`` save policy normally pins its full bf16 tensor in HBM
    between forward and backward (2 bytes/elem written at fwd, read at bwd).
    Routing it through this op instead tags the int8 codes + per-token fp32
    scales with the policy ``name`` (1.03 bytes/elem) — the backward
    recompute starts from the saved int8 pair, so both the residual memory
    and the save/read HBM traffic halve.  The precedent is the same dynamic
    per-token scheme the W4A8 dots already apply to every projection INPUT
    (``qmatmul_a8``); here the projection OUTPUT is additionally rounded, a
    forward-noise term of the same O(1/127) order the 1B quality anchor
    bounds end to end (``exp_quant_quality.py`` sq8 arm).

    The gradient is the straight-through identity (the rounding carries no
    useful derivative), matching the a8 dots' convention.  The reference has
    no analog — its grad checkpointing recomputes full layers from bf16
    inputs (``modeling_llama.py:719-733``).
    """
    return _q8rt_impl(name, y)


def _q8rt_fwd(name, y):
    return _q8rt_impl(name, y), None


def _q8rt_bwd(name, _, g):
    return (g,)


q8_roundtrip.defvjp(_q8rt_fwd, _q8rt_bwd)


def _a8_fwd_impl(x: Array, w: dict, out_dtype=None) -> Array:
    xq, sx = _a8_quantize(x)
    if "w_i4" in w:
        lo, hi = unpack_int4(w["w_i4"])
        h = lo.shape[-2]
        acc = (jnp.einsum("bld,df->blf", xq[..., :h], lo,
                          preferred_element_type=jnp.int32) +
               jnp.einsum("bld,df->blf", xq[..., h:], hi,
                          preferred_element_type=jnp.int32))
    else:
        acc = jnp.einsum("bld,df->blf", xq, w["w_i8"],
                         preferred_element_type=jnp.int32)
    sw = w["scale"].reshape((1,) * (acc.ndim - 1) + (-1,))
    return (acc.astype(jnp.float32) * sx * sw).astype(out_dtype or x.dtype)


def qmatmul_a8(x: Array, w: dict, bwd_a8: bool = False,
               out_dtype=None) -> Array:
    """x @ w with the ACTIVATIONS dynamically quantized to int8 per token
    (W4A8 / W8A8): the dot runs int8 x int8 -> int32 on the MXU's int8 path
    (~1.5-2x the bf16 dot rate on v5e; measured 193 T/s vs 118 at the 7B
    train shape).  Weight-only error bounds still hold for the frozen base;
    the activation quantization adds a per-token relative error of order
    1/127 that the quality anchor (exp_quant_quality.py) bounds end to end.

    Backward (``bwd_a8=False``) is the straight-through estimator on the
    bf16 dequant path: dX = (g * w_scale) @ W_int^T — identical math to the
    weight-only path's autodiff dX (the rounding nonlinearity and the sx(x)
    dependence carry no useful gradient).  Weights are frozen, so no dW
    exists.

    ``bwd_a8=True`` additionally quantizes the scaled cotangent g*w_scale
    per token to int8 so the dX dots also ride the MXU int8 path (the
    SwitchBack recipe restricted to dX — there is no dW here).  Gradient
    numerics change by O(1/127) per token; the 1B quality anchor bounds
    the full-int8 arm end to end.

    ``out_dtype`` overrides the output dtype (default: x's dtype) — the
    chunked-CE head dot wants fp32 logits straight off the int32
    accumulator (no bf16 round-trip before the softmax)."""
    return _qmatmul_a8(bwd_a8, out_dtype, x, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _qmatmul_a8(bwd_a8: bool, out_dtype, x: Array, w: dict) -> Array:
    return _a8_fwd_impl(x, w, out_dtype)


def _a8_vjp_fwd(bwd_a8, out_dtype, x, w):
    # zero-size sentinel carries x's dtype for the cotangent (g may be
    # out_dtype, e.g. fp32 logits over a bf16 x)
    return _a8_fwd_impl(x, w, out_dtype), (w, jnp.zeros((0,), x.dtype))


def _a8_vjp_bwd(bwd_a8, out_dtype, res, g):
    (w, xd) = res
    xdtype = xd.dtype
    sw = w["scale"].reshape((1,) * (g.ndim - 1) + (-1,))
    if bwd_a8:
        # per-token int8 on the scaled cotangent: sw varies along the
        # CONTRACTED axis f, so it must fold in before quantization
        gq, sg = _a8_quantize(g.astype(jnp.float32) * sw)
        if "w_i4" in w:
            lo, hi = unpack_int4(w["w_i4"])
            dx = jnp.concatenate(
                [jnp.einsum("blf,df->bld", gq, lo,
                            preferred_element_type=jnp.int32),
                 jnp.einsum("blf,df->bld", gq, hi,
                            preferred_element_type=jnp.int32)],
                axis=-1).astype(jnp.float32)
        else:
            dx = jnp.einsum("blf,df->bld", gq, w["w_i8"],
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32)
        dx = (dx * sg).astype(xdtype)
    elif "w_i4" in w:
        gs = (g.astype(jnp.float32) * sw).astype(xdtype)
        lo, hi = unpack_int4(w["w_i4"])
        dx = jnp.concatenate(
            [jnp.einsum("blf,df->bld", gs, lo.astype(xdtype),
                        preferred_element_type=jnp.float32),
             jnp.einsum("blf,df->bld", gs, hi.astype(xdtype),
                        preferred_element_type=jnp.float32)],
            axis=-1).astype(xdtype)
    else:
        gs = (g.astype(jnp.float32) * sw).astype(xdtype)
        dx = jnp.einsum("blf,df->bld", gs, w["w_i8"].astype(xdtype),
                        preferred_element_type=jnp.float32).astype(xdtype)
    zeros = jax.tree.map(
        lambda a: (jnp.zeros(a.shape, jax.dtypes.float0)
                   if not jnp.issubdtype(a.dtype, jnp.inexact)
                   else jnp.zeros_like(a)), w)
    return dx, zeros


_qmatmul_a8.defvjp(_a8_vjp_fwd, _a8_vjp_bwd)


def quantize_llama_base(base: dict, bits: int = 8,
                        head_bits: int | None = None) -> dict:
    """Quantize the 7 projection families of a layer-stacked LLaMA tree.

    ``head_bits`` additionally quantizes the frozen lm_head (d, V) —
    per-out-channel over d, same QLoRA class as the base: the chunked-CE
    scan re-reads the 250 MB bf16 head ~3x per chunk per step, so halving
    it (and riding the int8 MXU path via ``qmatmul_a8``) attacks the
    measured bandwidth-saturated CE cost directly."""
    quant = {8: quantize_int8, 4: quantize_int4}[bits]
    layers = dict(base["layers"])
    for name in QUANT_KEYS:
        layers[name] = quant(base["layers"][name], axis=-2)
    out = dict(base)
    out["layers"] = layers
    if head_bits:
        hq = {8: quantize_int8, 4: quantize_int4}[head_bits]
        out["lm_head"] = hq(base["lm_head"], axis=-2)
    return out


def quantize_encoder(params: dict, bits: int = 8,
                     min_dim: int = 64) -> dict:
    """Weight-only quantization for a frozen encoder tree (CLIP ViT /
    BEATs).

    The encoders are exactly as frozen as the LLaMA base
    (``multimodal_encoder.py:44,183-186`` freezes both towers), so the same
    QLoRA-class treatment applies: every ``{"w": (..., d_in, d_out), "b"}``
    linear leaf-dict whose matmul dims are both >= ``min_dim`` gets its
    weight replaced by a quantized ``{"w_i8"/"w_i4", "scale"}`` dict
    (per-out-channel scales; layer-stacked (N, d_in, d_out) weights get one
    scale per (layer, out-channel)).  Tiny heads (e.g. BEATs' (hd, 8) GRU
    gate), norms, embeddings, and conv kernels pass through untouched.  The
    encoders' ``_dense`` consumes both layouts (``qmatmul``)."""
    quant = {8: quantize_int8, 4: quantize_int4}[bits]

    def walk(node):
        if isinstance(node, dict):
            if is_quantized(node):
                return node
            w = node.get("w")
            if (w is not None and hasattr(w, "ndim") and w.ndim >= 2
                    and min(w.shape[-2:]) >= min_dim
                    and (bits == 8 or w.shape[-2] % 2 == 0)):
                return {**{k: walk(v) for k, v in node.items() if k != "w"},
                        "w": quant(w, axis=-2)}
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def quantized_bytes(tree) -> int:
    import numpy as np
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree.leaves(tree))


def init_llama_params_quantized(rng: Array, cfg, bits: int = 8,
                                head_bits: int | None = None) -> dict:
    """Random-init a llama base directly in quantized form, one projection
    family at a time with donated quantization — peak memory stays at
    quantized-size + one bf16 family, never the full bf16 tree (which would
    OOM a 16 GB chip during setup for 7B)."""
    from moka_tpu.models.llama import _proj_shapes

    shapes = _proj_shapes(cfg)
    n = cfg.n_layers
    keys = iter(jax.random.split(rng, len(shapes) + 3))
    quant = jax.jit({8: quantize_int8, 4: quantize_int4}[bits],
                    donate_argnums=0)

    layers = {}
    for name, (d_in, d_out) in shapes.items():
        w = jax.random.normal(next(keys), (n, d_in, d_out),
                              jnp.bfloat16) * 0.02
        layers[name] = jax.block_until_ready(quant(w))
        del w
    layers["attn_norm"] = jnp.ones((n, cfg.dim), jnp.bfloat16)
    layers["mlp_norm"] = jnp.ones((n, cfg.dim), jnp.bfloat16)
    lm_head = jax.random.normal(next(keys), (cfg.dim, cfg.vocab_size),
                                jnp.bfloat16) * 0.02
    if head_bits:
        hq = jax.jit({8: quantize_int8, 4: quantize_int4}[head_bits],
                     donate_argnums=0)
        lm_head = jax.block_until_ready(hq(lm_head))
    return {
        "embed": jax.random.normal(next(keys), (cfg.vocab_size, cfg.dim),
                                   jnp.bfloat16) * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((cfg.dim,), jnp.bfloat16),
        "lm_head": lm_head,
    }


def import_llama_quantized(sd: dict, cfg, bits: int = 8,
                           head_bits: int | None = None) -> dict:
    """Checkpoint import straight to int8/int4 (no full bf16 tree held)."""
    from moka_tpu.train.import_torch import import_llama

    base = import_llama(sd, cfg, dtype=jnp.bfloat16)  # host->device per leaf
    return quantize_llama_base(base, bits=bits, head_bits=head_bits)
