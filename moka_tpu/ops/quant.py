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


def dequantize(qw: dict, dtype=jnp.bfloat16) -> Array:
    return (qw["w_i8"].astype(jnp.float32) * qw["scale"]).astype(dtype)


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "w_i8" in w


def qmatmul(x: Array, w, *, spec: str = "bld,df->blf") -> Array:
    """x @ w for plain or int8-quantized weights.  The dequantized weight is
    a fusion-local temporary (one per layer inside the scan/loop body)."""
    if is_quantized(w):
        w = dequantize(w, dtype=x.dtype)
    return jnp.einsum(spec, x, w)


def quantize_llama_base(base: dict) -> dict:
    """Quantize the 7 projection families of a layer-stacked LLaMA tree."""
    layers = dict(base["layers"])
    for name in QUANT_KEYS:
        layers[name] = quantize_int8(base["layers"][name], axis=-2)
    out = dict(base)
    out["layers"] = layers
    return out


def quantized_bytes(tree) -> int:
    import numpy as np
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree.leaves(tree))


def init_llama_params_quantized(rng: Array, cfg) -> dict:
    """Random-init a llama base directly in quantized form, one projection
    family at a time with donated quantization — peak memory stays at
    int8-size + one bf16 family, never the full bf16 tree (which would OOM
    a 16 GB chip during setup for 7B)."""
    from moka_tpu.models.llama import _proj_shapes

    shapes = _proj_shapes(cfg)
    n = cfg.n_layers
    keys = iter(jax.random.split(rng, len(shapes) + 3))
    quant = jax.jit(quantize_int8, donate_argnums=0)

    layers = {}
    for name, (d_in, d_out) in shapes.items():
        w = jax.random.normal(next(keys), (n, d_in, d_out),
                              jnp.bfloat16) * 0.02
        layers[name] = jax.block_until_ready(quant(w))
        del w
    layers["attn_norm"] = jnp.ones((n, cfg.dim), jnp.bfloat16)
    layers["mlp_norm"] = jnp.ones((n, cfg.dim), jnp.bfloat16)
    return {
        "embed": jax.random.normal(next(keys), (cfg.vocab_size, cfg.dim),
                                   jnp.bfloat16) * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((cfg.dim,), jnp.bfloat16),
        "lm_head": jax.random.normal(next(keys), (cfg.dim, cfg.vocab_size),
                                     jnp.bfloat16) * 0.02,
    }


def import_llama_quantized(sd: dict, cfg) -> dict:
    """Checkpoint import straight to int8 (no full bf16 tree on device)."""
    from moka_tpu.train.import_torch import import_llama
    import numpy as np

    base = import_llama(sd, cfg, dtype=jnp.bfloat16)  # host->device per leaf
    return quantize_llama_base(base)
