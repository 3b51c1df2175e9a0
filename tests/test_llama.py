"""Decoder tests: forward shapes, cache-consistency (prefill + step decode
equals full uncached forward), adapter effect, and loss masking."""

import numpy as np
import jax
import jax.numpy as jnp

from moka_tpu.core.config import LlamaConfig
from moka_tpu.models import llama
from moka_tpu.ops.moka import MokaSpec


CFG = LlamaConfig.tiny()
SPEC = MokaSpec.avt(rank=4, lora_alpha=16.0, blc_weight=1.0, dropout_rate=0.0)


def _setup(seed=0, dtype=jnp.float32):
    rng = jax.random.key(seed)
    r1, r2 = jax.random.split(rng)
    base = llama.init_llama_params(r1, CFG, dtype=dtype)
    adapters = llama.init_moka_adapters(r2, CFG, SPEC)
    # make B nonzero so adapters actually do something
    adapters = jax.tree.map(
        lambda x: x + 0.01 if x.ndim == 3 else x, adapters)
    return base, adapters


def _masks(b, L):
    rng = np.random.default_rng(0)
    mod = np.zeros((3, b, L), np.float32)
    q = np.zeros((b, L), np.float32)
    for i in range(b):
        mod[0, i, : L // 2] = 1
        mod[1, i, L // 2: 3 * L // 4] = 1
        mod[2, i, 3 * L // 4:] = 1
        q[i, 2:5] = 1
    return llama.MaskBundle(jnp.asarray(mod), jnp.asarray(q))


def test_forward_shapes():
    base, adapters = _setup()
    b, L = 2, 16
    toks = jnp.arange(b * L).reshape(b, L) % CFG.vocab_size
    logits, _ = llama.forward(base, CFG, adapters=adapters, spec=SPEC,
                              tokens=toks, masks=_masks(b, L))
    assert logits.shape == (b, L, CFG.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_adapters_change_logits():
    base, adapters = _setup()
    b, L = 2, 16
    toks = jnp.arange(b * L).reshape(b, L) % CFG.vocab_size
    with_a, _ = llama.forward(base, CFG, adapters=adapters, spec=SPEC,
                              tokens=toks, masks=_masks(b, L))
    without, _ = llama.forward(base, CFG, tokens=toks)
    assert float(jnp.abs(with_a - without).max()) > 1e-4


def test_prefill_decode_matches_full_forward():
    """Greedy-decode invariant: logits from (prefill L0, then k single-token
    cached steps) == logits from one uncached call on the whole sequence.
    This is what lets the rebuild drop the reference's forked GenerationMixin
    (my_utils.py) entirely."""
    base, adapters = _setup()
    b, L0, steps, S = 2, 12, 4, 20
    L = L0 + steps
    toks = (jnp.arange(b * L).reshape(b, L) * 7 + 3) % CFG.vocab_size

    # full uncached forward (text-only mask: decode parity needs the
    # text-adapter path everywhere, so compare without multimodal masks)
    full, _ = llama.forward(base, CFG, adapters=adapters, spec=SPEC,
                            tokens=toks)

    cache = llama.init_kv_cache(CFG, b, S, dtype=jnp.float32)
    attn_mask = (jnp.arange(S)[None, :] < L0).astype(jnp.int32)
    attn_mask = jnp.broadcast_to(attn_mask, (b, S))
    pre_logits, cache = llama.forward(
        base, CFG, adapters=adapters, spec=SPEC, tokens=toks[:, :L0],
        attn_mask=attn_mask, cache=cache)
    np.testing.assert_allclose(np.asarray(pre_logits),
                               np.asarray(full[:, :L0]), rtol=2e-4, atol=2e-4)

    for t in range(steps):
        cur = L0 + t
        attn_mask = (jnp.arange(S)[None, :] <= cur).astype(jnp.int32)
        attn_mask = jnp.broadcast_to(attn_mask, (b, S))
        step_logits, cache = llama.forward(
            base, CFG, adapters=adapters, spec=SPEC,
            tokens=toks[:, cur:cur + 1],
            positions=jnp.full((b, 1), cur),
            attn_mask=attn_mask, cache=cache)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full[:, cur]),
            rtol=2e-4, atol=2e-4)


def test_remat_matches():
    base, adapters = _setup()
    b, L = 2, 8
    toks = jnp.arange(b * L).reshape(b, L) % CFG.vocab_size
    masks = _masks(b, L)
    y1, _ = llama.forward(base, CFG, adapters=adapters, spec=SPEC,
                          tokens=toks, masks=masks, remat=False)
    y2, _ = llama.forward(base, CFG, adapters=adapters, spec=SPEC,
                          tokens=toks, masks=masks, remat=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5,
                               atol=1e-5)


def test_cross_entropy_ignore_index():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.array([[-100, 2, -100, 3]])
    loss = llama.cross_entropy_loss(logits, labels)
    # uniform logits -> log(8) per supervised position
    np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-6)


def test_grads_only_adapters():
    base, adapters = _setup()
    b, L = 2, 8
    toks = jnp.arange(b * L).reshape(b, L) % CFG.vocab_size
    labels = toks.at[:, :2].set(-100)
    masks = _masks(b, L)

    def loss_fn(ad):
        logits, _ = llama.forward(base, CFG, adapters=ad, spec=SPEC,
                                  tokens=toks, masks=masks, remat=True)
        return llama.cross_entropy_loss(logits, labels)

    g = jax.grad(loss_fn)(adapters)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_rope_scaling_variants():
    """Linear and dynamic-NTK RoPE scaling (reference
    modeling_llama.py:128-178) change long-position frequencies only."""
    from moka_tpu.ops.rope import rope_cos_sin
    import jax.numpy as jnp
    pos = jnp.arange(16)[None, :]
    base_cos, _ = rope_cos_sin(pos, 16, 10000.0, None)
    lin_cos, _ = rope_cos_sin(pos, 16, 10000.0, ("linear", 2.0))
    # linear scaling halves effective positions: cos(p/2 * f) == cos at p/2
    half_cos, _ = rope_cos_sin(jnp.arange(0, 8, 0.5)[None, :], 16, 10000.0,
                               None)
    np.testing.assert_allclose(np.asarray(lin_cos), np.asarray(half_cos),
                               rtol=1e-5)
    # dynamic NTK: identical below max_seq_len, different beyond
    dyn_short, _ = rope_cos_sin(pos, 16, 10000.0, ("dynamic", 2.0),
                                seq_len=16, max_seq_len=32)
    np.testing.assert_allclose(np.asarray(dyn_short), np.asarray(base_cos),
                               rtol=1e-6)
    dyn_long, _ = rope_cos_sin(pos, 16, 10000.0, ("dynamic", 2.0),
                               seq_len=64, max_seq_len=32)
    assert float(np.abs(np.asarray(dyn_long) - np.asarray(base_cos)).max()) \
        > 1e-4


def test_remat_policy_grads_match_no_remat():
    """Gradients under the save-policy remat variants — including the
    flash-residual-saving ones (flash_out/flash_lse checkpoint names inside
    the flash custom-VJP fwd rule) — match the no-remat gradients."""
    import pytest

    base, adapters = _setup()
    b, L = 2, 16
    toks = jnp.arange(b * L).reshape(b, L) % CFG.vocab_size
    labels = jnp.asarray(np.where(np.arange(L) < 2, -100,
                                  np.asarray(toks)), jnp.int32)
    masks = _masks(b, L)

    def loss_fn(ad, remat, policy, use_flash):
        logits, _ = llama.forward(base, CFG, adapters=ad, spec=SPEC,
                                  tokens=toks, masks=masks, remat=remat,
                                  remat_policy=policy, use_flash=use_flash)
        return llama.cross_entropy_loss(logits, labels)

    for use_flash in (False, True):
        ref = jax.grad(loss_fn)(adapters, False, None, use_flash)
        for policy in ("qkvod", "qkvod_lse", "proj_nokv", "proj_nokv_lse",
                       "proj", "proj_lse"):
            got = jax.grad(loss_fn)(adapters, True, policy, use_flash)
            for (p1, g1), (p2, g2) in zip(
                    jax.tree_util.tree_leaves_with_path(ref),
                    jax.tree_util.tree_leaves_with_path(got)):
                np.testing.assert_allclose(
                    np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=1e-6,
                    err_msg=f"policy={policy} flash={use_flash} leaf={p1}")
