"""Shared LoRA-dropout masks (``MokaSpec.dropout_shared_masks``).

The lever folds ONE dropout rng per distinct adapter-input tensor (q/k/v;
gate/up) instead of one per projection, so XLA CSE collapses the identical
chains.  These tests pin the semantics: the flag changes only mask
correlation (not the per-element Bernoulli rate), is a no-op at rate 0,
and produces a valid, differentiable train path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from moka_tpu.core.config import LlamaConfig
from moka_tpu.models import llama
from moka_tpu.models.llama import _PROJ_GROUP, _PROJ_INDEX
from moka_tpu.ops.moka import MokaSpec
from moka_tpu.train.objectives import make_llama_moka_loss


def _setup(rate):
    cfg = LlamaConfig.tiny(vocab_size=128)
    spec = MokaSpec.avt(rank=4, dropout_rate=rate)
    k1, k2 = jax.random.split(jax.random.key(0))
    frozen = llama.init_llama_params(k1, cfg, dtype=jnp.float32)
    trainable = {"adapters": llama.init_moka_adapters(k2, cfg, spec)}
    # LoRA-style init has B = 0 (delta == 0 whatever the mask does);
    # randomize B so dropout on the A input is visible in the loss
    kb = jax.random.key(7)
    trainable = jax.tree_util.tree_map_with_path(
        lambda path, x: (0.1 * jax.random.normal(
            jax.random.fold_in(kb, abs(hash(str(path))) % (2**31)),
            x.shape, x.dtype)
            if any(getattr(p, "key", None) == "b" for p in path) else x),
        trainable)
    rng = np.random.default_rng(0)
    b, L = 2, 32
    toks = jnp.asarray(rng.integers(4, 100, (b, L)), jnp.int32)
    labels = toks
    mod = np.zeros((3, b, L), np.float32)
    mod[0, :, : L // 2] = 1
    mod[1, :, L // 2: 3 * L // 4] = 1
    mod[2, :, 3 * L // 4:] = 1
    q = np.zeros((b, L), np.float32)
    q[:, 2:8] = 1
    batch = {"tokens": toks, "labels": labels,
             "modality_masks": jnp.asarray(mod),
             "question_mask": jnp.asarray(q)}
    return cfg, spec, frozen, trainable, batch


def test_group_map_covers_projections():
    assert set(_PROJ_GROUP) == set(_PROJ_INDEX)
    # same-input projections share a group; distinct inputs do not
    assert _PROJ_GROUP["q"] == _PROJ_GROUP["k"] == _PROJ_GROUP["v"]
    assert _PROJ_GROUP["gate"] == _PROJ_GROUP["up"]
    assert len({_PROJ_GROUP["q"], _PROJ_GROUP["o"], _PROJ_GROUP["gate"],
                _PROJ_GROUP["down"]}) == 4


def test_noop_at_rate_zero():
    cfg, spec, frozen, trainable, batch = _setup(0.0)
    f1 = make_llama_moka_loss(cfg, spec)
    f2 = make_llama_moka_loss(cfg, spec.with_shared_dropout_masks())
    key = jax.random.key(3)
    l1 = float(f1(trainable, frozen, batch, key)[0])
    l2 = float(f2(trainable, frozen, batch, key)[0])
    assert l1 == l2


def test_shared_changes_masks_but_trains():
    cfg, spec, frozen, trainable, batch = _setup(0.5)  # high rate: visible
    f_ind = make_llama_moka_loss(cfg, spec)
    f_sh = make_llama_moka_loss(cfg, spec.with_shared_dropout_masks())
    key = jax.random.key(3)
    l_ind = float(f_ind(trainable, frozen, batch, key)[0])
    l_sh = float(f_sh(trainable, frozen, batch, key)[0])
    # different mask draw -> different loss realization; both finite
    assert np.isfinite(l_ind) and np.isfinite(l_sh)
    assert l_ind != l_sh
    # deterministic per key
    assert l_sh == float(f_sh(trainable, frozen, batch, key)[0])
    # grads flow through the shared-mask path
    g = jax.grad(lambda t: f_sh(t, frozen, batch, key)[0])(trainable)
    gsum = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gsum) and gsum > 0
