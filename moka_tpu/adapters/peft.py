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


# ------------------------------------------------------------------- OFT --

def init_oft(d_in: int, block_size: int = 4) -> dict:
    """OFT: single block-diagonal orthogonal transform (BOFT without the
    butterfly factorization — reference tuners/oft)."""
    if d_in % block_size:
        raise ValueError(d_in)
    return {"q": jnp.zeros((d_in // block_size, block_size, block_size),
                           jnp.float32)}


def oft_weight(w: Array, p: dict) -> Array:
    r = cayley(p["q"])
    return block_diag_matmul(r[None], w[None], use_pallas=False)[0]


def oft_linear(x: Array, w: Array, p: dict) -> Array:
    return jnp.einsum("...d,df->...f", x, oft_weight(w, p))


# ------------------------------------------------------------------ LoHa --

def init_loha(rng: Array, d_in: int, d_out: int, rank: int = 4) -> dict:
    """LoHa: delta = (A1 @ B1) * (A2 @ B2) Hadamard (reference tuners/loha)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    s = 1.0 / math.sqrt(d_in)
    return {"a1": jax.random.uniform(k1, (d_in, rank), jnp.float32, -s, s),
            "b1": jnp.zeros((rank, d_out), jnp.float32),
            "a2": jax.random.uniform(k2, (d_in, rank), jnp.float32, -s, s),
            "b2": jax.random.uniform(k3, (rank, d_out), jnp.float32, -s, s)}


def loha_delta(p: dict, scale: float = 1.0) -> Array:
    return (p["a1"] @ p["b1"]) * (p["a2"] @ p["b2"]) * scale


def loha_linear(x: Array, w: Array, p: dict, scale: float = 1.0) -> Array:
    return jnp.einsum("...d,df->...f", x, w + loha_delta(p, scale))


# ------------------------------------------------------------------ LoKr --

def init_lokr(rng: Array, d_in: int, d_out: int, factor_in: int,
              factor_out: int, rank: int = 4) -> dict:
    """LoKr: delta = kron(C, A @ B) with C (factor_in, factor_out) and the
    low-rank pair covering the complementary factors (reference tuners/lokr)."""
    if d_in % factor_in or d_out % factor_out:
        raise ValueError((d_in, factor_in, d_out, factor_out))
    u_in, u_out = d_in // factor_in, d_out // factor_out
    k1, k2, k3 = jax.random.split(rng, 3)
    s = 1.0 / math.sqrt(u_in)
    return {"c": jax.random.normal(k1, (factor_in, factor_out)) * 0.02,
            "a": jax.random.uniform(k2, (u_in, rank), jnp.float32, -s, s),
            "b": jnp.zeros((rank, u_out), jnp.float32)}


def lokr_delta(p: dict, scale: float = 1.0) -> Array:
    return jnp.kron(p["c"], p["a"] @ p["b"]) * scale


def lokr_linear(x: Array, w: Array, p: dict, scale: float = 1.0) -> Array:
    return jnp.einsum("...d,df->...f", x, w + lokr_delta(p, scale))


# ------------------------------------------------------------------ VeRA --

def init_vera(rng: Array, d_in: int, d_out: int, rank: int = 16) -> dict:
    """VeRA: shared frozen random A/B + trainable per-layer scaling vectors
    (reference tuners/vera).  The frozen pair lives here for convenience;
    share it across layers by passing the same dict."""
    k1, k2 = jax.random.split(rng)
    return {
        "frozen_a": jax.random.normal(k1, (d_in, rank)) / math.sqrt(d_in),
        "frozen_b": jax.random.normal(k2, (rank, d_out)) / math.sqrt(rank),
        "d": jnp.ones((rank,), jnp.float32) * 0.1,
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def vera_linear(x: Array, w: Array, p: dict) -> Array:
    h = jnp.einsum("...d,dr->...r", x, p["frozen_a"]) * p["d"]
    delta = jnp.einsum("...r,rf->...f", h, p["frozen_b"]) * p["b"]
    return jnp.einsum("...d,df->...f", x, w) + delta


# --------------------------------------------------------------- AdaLoRA --

@dataclasses.dataclass(frozen=True)
class AdaLoraSpec:
    """AdaLoRA (reference tuners/adalora): SVD-parametrized delta
    ``P diag(lam) Q`` with an orthogonality regularizer and a global rank
    budget enforced by masking the least-important singular values."""
    init_rank: int = 12
    target_rank: int = 4
    orth_reg_weight: float = 0.5


def init_adalora(rng: Array, d_in: int, d_out: int,
                 spec: AdaLoraSpec) -> dict:
    k1, k2 = jax.random.split(rng)
    r = spec.init_rank
    return {"p": jax.random.normal(k1, (d_in, r)) * 0.02,
            "lam": jnp.zeros((r,), jnp.float32),
            "q": jax.random.normal(k2, (r, d_out)) * 0.02,
            "mask": jnp.ones((r,), jnp.float32)}


def adalora_delta(p: dict) -> Array:
    # the 0/1 mask lives in the trainable tree for checkpointing but is NOT
    # a parameter: stop_gradient keeps the optimizer from drifting it
    mask = jax.lax.stop_gradient(p["mask"])
    return (p["p"] * (p["lam"] * mask)) @ p["q"]


def adalora_linear(x: Array, w: Array, p: dict) -> Array:
    return jnp.einsum("...d,df->...f", x, w + adalora_delta(p))


def adalora_orth_reg(p: dict) -> Array:
    """||P^T P - I||_F^2 + ||Q Q^T - I||_F^2 (added to the loss)."""
    r = p["p"].shape[1]
    eye = jnp.eye(r)
    a = p["p"].T @ p["p"] - eye
    b = p["q"] @ p["q"].T - eye
    return jnp.sum(a * a) + jnp.sum(b * b)


def adalora_importance(p: dict, grads: dict) -> Array:
    """Sensitivity-based importance of each singular direction:
    |lam * dL/dlam| (the AdaLoRA scoring signal)."""
    return jnp.abs(p["lam"] * grads["lam"])


def adalora_allocate(importances: list[Array], total_budget: int
                     ) -> list[Array]:
    """Global top-k across all layers' singular values -> 0/1 masks."""
    sizes = [imp.shape[0] for imp in importances]
    flat = jnp.concatenate(importances)
    k = min(total_budget, flat.shape[0])
    thresh = jnp.sort(flat)[-k]
    masks = []
    off = 0
    for n in sizes:
        masks.append((flat[off:off + n] >= thresh).astype(jnp.float32))
        off += n
    return masks


# ------------------------------------------------------------------ Poly --

@dataclasses.dataclass(frozen=True)
class PolySpec:
    """Polytropon multi-task routing (reference ``modified_peft/tuners/
    poly``): a bank of ``n_skills`` LoRA experts per ``n_splits`` feature
    split, mixed per sample by a task-conditioned router."""
    n_tasks: int
    n_skills: int = 4
    n_splits: int = 1
    rank: int = 4


def init_poly(rng: Array, d_in: int, d_out: int, spec: PolySpec) -> dict:
    """Upstream init: A kaiming-uniform over the (split-local d_in, r)
    fan, B zeros, router logits ~ U(-1e-3, 1e-3) (``poly/layer.py``
    reset_poly_parameters, ``router.py`` reset)."""
    k1, k2 = jax.random.split(rng)
    di, do = d_in // spec.n_splits, d_out // spec.n_splits
    bound = math.sqrt(6.0 / ((1 + 5) * di))  # kaiming_uniform a=sqrt(5)
    return {
        "a": jax.random.uniform(k1, (spec.n_splits, spec.n_skills, di,
                                     spec.rank), minval=-bound,
                                maxval=bound),
        "b": jnp.zeros((spec.n_splits, spec.n_skills, spec.rank, do)),
        "router": jax.random.uniform(k2, (spec.n_tasks,
                                          spec.n_splits * spec.n_skills),
                                     minval=-1e-3, maxval=1e-3),
    }


def poly_mixing_weights(router: Array, task_ids: Array, spec: PolySpec,
                        rng: Array | None = None) -> Array:
    """(b, n_splits, n_skills) normalized skill weights.

    Eval: sigmoid(logits); train (rng given): RelaxedBernoulli(temp=1)
    reparametrized sample sigmoid(logits + logistic noise) — upstream
    ``router.py`` forward."""
    logits = router[task_ids].reshape(-1, spec.n_splits, spec.n_skills)
    if rng is not None:
        u = jax.random.uniform(rng, logits.shape, minval=1e-6,
                               maxval=1.0 - 1e-6)
        logits = logits + jnp.log(u) - jnp.log1p(-u)
    s = jax.nn.sigmoid(logits)
    return s / (jnp.sum(s, axis=-1, keepdims=True) + 1e-12)


def poly_linear(x: Array, w: Array, p: dict, task_ids: Array,
                spec: PolySpec, rng: Array | None = None) -> Array:
    """base(x) + x @ A_mix @ B_mix / r with per-sample mixed experts
    (``poly/layer.py`` forward)."""
    mw = poly_mixing_weights(p["router"], task_ids, spec, rng)
    b = x.shape[0]
    a_mix = jnp.einsum("bqs,qsdr->bqdr", mw, p["a"])
    b_mix = jnp.einsum("bqs,qsrd->bqrd", mw, p["b"])
    r = spec.rank
    a_mix = a_mix.reshape(b, -1, r)                     # (b, d_in, r)
    b_mix = jnp.swapaxes(b_mix, 1, 2).reshape(b, r, -1)  # (b, r, d_out)
    delta = jnp.einsum("bld,bdr->blr", x, a_mix)
    delta = jnp.einsum("blr,brd->bld", delta, b_mix) / r
    return jnp.einsum("...d,df->...f", x, w) + delta


def is_adalora_params(node) -> bool:
    return isinstance(node, dict) and {"p", "lam", "q", "mask"} <= set(node)


def adalora_tree_paths(params) -> list[tuple]:
    """Key paths of every AdaLoRA param dict inside an arbitrary pytree."""
    paths = []

    def walk(node, path):
        if is_adalora_params(node):
            paths.append(path)
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))

    walk(params, ())
    return paths


def adalora_grad_taps(grads):
    """The lam cotangents of every AdaLoRA subtree (tiny vectors) — tapped
    out of the train step so the allocator can score importance without a
    second backward."""
    return {"/".join(p): _get(grads, p)["lam"]
            for p in adalora_tree_paths(grads)}


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def adalora_update_masks(params, lam_grads: dict, total_budget: int):
    """Re-allocate the global rank budget from sensitivity scores
    |lam * dL/dlam| (the AdaLoRA schedule step —
    ``modified_peft/tuners/adalora`` RankAllocator.update_and_allocate).
    Returns params with refreshed 0/1 masks."""
    paths = adalora_tree_paths(params)
    imps = [adalora_importance(_get(params, p),
                               {"lam": lam_grads["/".join(p)]})
            for p in paths]
    masks = adalora_allocate(imps, total_budget)
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    for path, mask in zip(paths, masks):
        node = out
        for k in path[:-1]:
            node[k] = dict(node[k])
            node = node[k]
        node[path[-1]] = dict(node[path[-1]], mask=mask)
    return out
