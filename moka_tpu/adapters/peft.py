"""Adapter library beyond MokA: plain LoRA, IA3, BOFT.

The reference vendors full PEFT 0.11.1 (``VisualText/modified_peft`` —
SURVEY.md §2.8) of which only lora/mixed_model are load-bearing for MokA;
these are the commonly-used extra tuners rebuilt as pure functions on the
same (frozen base + adapter pytree) convention.  BOFT uses the
``ops.fbd`` block-diagonal Pallas op (the reference's one CUDA extension,
``modified_peft/tuners/boft/fbd``)."""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from moka_tpu.ops.fbd import block_diag_matmul, butterfly_perm, cayley

Array = jax.Array


# ------------------------------------------------------------ plain LoRA --

@dataclasses.dataclass(frozen=True)
class LoraSpec:
    rank: int = 8
    alpha: float = 16.0
    dropout_rate: float = 0.0
    use_rslora: bool = False

    @property
    def scale(self) -> float:
        return self.alpha / math.sqrt(self.rank) if self.use_rslora else \
            self.alpha / self.rank


def init_lora(rng: Array, d_in: int, d_out: int, spec: LoraSpec) -> dict:
    bound = 1.0 / math.sqrt(d_in)
    return {"a": jax.random.uniform(rng, (d_in, spec.rank), jnp.float32,
                                    -bound, bound),
            "b": jnp.zeros((spec.rank, d_out), jnp.float32)}


def lora_linear(x: Array, w: Array, p: dict, spec: LoraSpec) -> Array:
    y = jnp.einsum("...d,df->...f", x, w)
    delta = jnp.einsum("...r,rf->...f",
                       jnp.einsum("...d,dr->...r", x, p["a"]), p["b"])
    return y + delta * spec.scale


def merge_lora(w: Array, p: dict, spec: LoraSpec) -> Array:
    """Delta-weight merge (stock PEFT behavior, ``layer.py:425-546``)."""
    return w + (p["a"] @ p["b"]) * spec.scale


# ------------------------------------------------------------------- IA3 --

def init_ia3(d_out: int) -> dict:
    return {"scale": jnp.ones((d_out,), jnp.float32)}


def ia3_linear(x: Array, w: Array, p: dict) -> Array:
    return jnp.einsum("...d,df->...f", x, w) * p["scale"]


# ------------------------------------------------------------------ BOFT --

@dataclasses.dataclass(frozen=True)
class BoftSpec:
    """Butterfly Orthogonal Fine-Tuning: the adapted weight is
    ``(prod_i P_i^T blockdiag(R_i) P_i) @ W`` over the in-features dim,
    each R_i an orthogonal (Cayley-parametrized) block."""
    block_size: int = 4
    n_factors: int = 2


def init_boft(d_in: int, spec: BoftSpec) -> dict:
    if d_in % spec.block_size:
        raise ValueError(f"d_in {d_in} % block {spec.block_size}")
    n_blocks = d_in // spec.block_size
    # zero-init -> Cayley(0) = I -> identity transform at start
    return {"q": jnp.zeros((spec.n_factors, n_blocks, spec.block_size,
                            spec.block_size), jnp.float32)}


def boft_weight(w: Array, p: dict, spec: BoftSpec,
                use_pallas: bool = False) -> Array:
    """Adapted weight: butterfly product applied to W's in-features axis."""
    d_in = w.shape[0]
    n_blocks = d_in // spec.block_size
    out = w
    for i in range(spec.n_factors):
        r = cayley(p["q"][i])  # (n_blocks, b, b) orthogonal
        stride = 2 ** i
        if n_blocks > 1 and stride < n_blocks:
            perm = butterfly_perm(n_blocks, min(stride, n_blocks // 2))
            full_perm = (perm[:, None] * spec.block_size +
                         jnp.arange(spec.block_size)[None, :]).reshape(-1)
            out = out[full_perm]
            out = block_diag_matmul(r[None], out[None],
                                    use_pallas=use_pallas)[0]
            inv = jnp.argsort(full_perm)
            out = out[inv]
        else:
            out = block_diag_matmul(r[None], out[None],
                                    use_pallas=use_pallas)[0]
    return out


def boft_linear(x: Array, w: Array, p: dict, spec: BoftSpec) -> Array:
    return jnp.einsum("...d,df->...f", x, boft_weight(w, p, spec))
