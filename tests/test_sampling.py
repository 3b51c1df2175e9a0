"""Sampling: HF logits-warper parity, sampled-set membership, decode and
engine integration (temperature / top-k / top-p; temperature 0 = greedy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moka_tpu.core.config import LlamaConfig
from moka_tpu.eval.decode import greedy_generate, sample_generate
from moka_tpu.eval.engine import DecodeEngine
from moka_tpu.eval.sampling import filter_logits, sample_tokens
from moka_tpu.models import llama
from moka_tpu.ops.moka import MokaSpec

CFG = LlamaConfig.tiny()
SPEC = MokaSpec.avt(rank=4, dropout_rate=0.0)
EOS = 2


# ------------------------------------------------------------- warper parity

@pytest.mark.parametrize("top_k,top_p", [(5, 1.0), (0, 0.7), (3, 0.9),
                                         (1, 1.0), (0, 0.01)])
def test_filter_logits_matches_hf_warpers(top_k, top_p):
    """filter_logits reproduces transformers' TopK/TopP warpers exactly
    (same -inf mask) on random logits."""
    import torch
    from transformers.generation.logits_process import (
        TopKLogitsWarper, TopPLogitsWarper)

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 64)).astype(np.float32) * 3

    ref = torch.tensor(logits)
    if top_k > 0:
        ref = TopKLogitsWarper(top_k=top_k)(None, ref)
    if top_p < 1.0:
        ref = TopPLogitsWarper(top_p=top_p)(None, ref)
    ref_kept = np.isfinite(ref.numpy())

    got = np.asarray(filter_logits(jnp.asarray(logits), top_k, top_p))
    got_kept = got > np.finfo(np.float32).min / 2
    np.testing.assert_array_equal(got_kept, ref_kept)
    np.testing.assert_allclose(np.where(got_kept, got, 0.0),
                               np.where(ref_kept, logits, 0.0), rtol=1e-6)


def test_filter_logits_per_row_params():
    """Per-row (b,) top_k/top_p arrays behave like applying each row's
    scalar setting separately."""
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((3, 32)).astype(np.float32))
    ks = [2, 0, 5]
    ps = [1.0, 0.5, 0.8]
    batched = np.asarray(filter_logits(logits, jnp.asarray(ks),
                                       jnp.asarray(ps)))
    for i in range(3):
        row = np.asarray(filter_logits(logits[i:i + 1], ks[i], ps[i]))[0]
        np.testing.assert_array_equal(batched[i], row)


# ------------------------------------------------------------ sample_tokens

def test_sample_tokens_greedy_and_topk1():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    am = np.asarray(jnp.argmax(logits, axis=-1))
    # temperature 0 -> argmax regardless of rng
    got = np.asarray(sample_tokens(logits, jax.random.key(0),
                                   temperature=0.0))
    np.testing.assert_array_equal(got, am)
    # top_k=1 -> argmax for any temperature/key
    for seed in range(3):
        got = np.asarray(sample_tokens(logits, jax.random.key(seed),
                                       temperature=1.7, top_k=1))
        np.testing.assert_array_equal(got, am)


def test_sample_tokens_membership():
    """Every draw stays inside the top-k set (50 keys, k=3)."""
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    top3 = np.asarray(jax.lax.top_k(logits, 3)[1])
    seen = set()
    for seed in range(50):
        got = np.asarray(sample_tokens(logits, jax.random.key(seed),
                                       temperature=1.0, top_k=3))
        for b in range(2):
            assert got[b] in top3[b], (got[b], top3[b])
            seen.add((b, int(got[b])))
    assert len(seen) > 2  # actually stochastic, not stuck on argmax


def test_sample_tokens_mixed_rows():
    """Row-wise temperature: greedy rows fixed, sampling rows in-set."""
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
    am = np.asarray(jnp.argmax(logits, axis=-1))
    temp = jnp.asarray([0.0, 1.0])
    for seed in range(10):
        got = np.asarray(sample_tokens(logits, jax.random.key(seed),
                                       temperature=temp, top_k=4))
        assert got[0] == am[0]
        assert got[1] in np.asarray(jax.lax.top_k(logits, 4)[1])[1]


# ------------------------------------------------------------ decode + engine

@pytest.fixture(scope="module")
def model():
    r1, r2 = jax.random.split(jax.random.key(0))
    base = llama.init_llama_params(r1, CFG, dtype=jnp.float32)
    adapters = llama.init_moka_adapters(r2, CFG, SPEC)
    adapters = jax.tree.map(lambda x: x + 0.01 if x.ndim == 3 else x,
                            adapters)
    return base, adapters


def test_sample_generate_temperature_zero_is_greedy(model):
    base, adapters = model
    rng = np.random.default_rng(5)
    ids = rng.integers(4, CFG.vocab_size, (2, 6)).astype(np.int32)
    embeds = jnp.take(base["embed"], jnp.asarray(ids), axis=0)
    mask = jnp.ones((2, 6), jnp.float32)
    g = greedy_generate(base, adapters, cfg=CFG, spec=SPEC,
                        inputs_embeds=embeds, prompt_mask=mask, masks=None,
                        max_new_tokens=8, eos_id=EOS, use_flash=False,
                        paged_decode=False)
    s = sample_generate(base, adapters, cfg=CFG, spec=SPEC,
                        inputs_embeds=embeds, prompt_mask=mask, masks=None,
                        max_new_tokens=8, eos_id=EOS, use_flash=False,
                        paged_decode=False, rng=jax.random.key(7),
                        temperature=0.0)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(s))


def test_sample_generate_stochastic_varies(model):
    """temperature 1.0, unfiltered: different keys give different sequences
    (tiny random model => near-flat logits)."""
    base, adapters = model
    rng = np.random.default_rng(6)
    ids = rng.integers(4, CFG.vocab_size, (1, 5)).astype(np.int32)
    embeds = jnp.take(base["embed"], jnp.asarray(ids), axis=0)
    mask = jnp.ones((1, 5), jnp.float32)
    outs = set()
    for seed in range(4):
        s = np.asarray(sample_generate(
            base, adapters, cfg=CFG, spec=SPEC, inputs_embeds=embeds,
            prompt_mask=mask, masks=None, max_new_tokens=8, eos_id=EOS,
            use_flash=False, paged_decode=False, rng=jax.random.key(seed),
            temperature=1.0))
        outs.add(tuple(s[0].tolist()))
    assert len(outs) > 1, outs


def _strip(toks):
    keep = []
    for t in toks:
        keep.append(int(t))
        if t == EOS:
            break
    return keep


def test_engine_topk1_sampling_matches_greedy(model):
    """Engine lanes with (temperature=1, top_k=1) must reproduce the greedy
    reference — including lanes mixed with plain greedy requests."""
    base, adapters = model
    rng = np.random.default_rng(7)
    prompts = [rng.integers(4, CFG.vocab_size, rng.integers(4, 9)).astype(
        np.int32) for _ in range(4)]
    max_new = 8

    ref = []
    for p in prompts:
        embeds = jnp.take(base["embed"], jnp.asarray(p)[None], axis=0)
        toks = np.asarray(greedy_generate(
            base, adapters, cfg=CFG, spec=SPEC, inputs_embeds=embeds,
            prompt_mask=jnp.ones((1, len(p)), jnp.float32), masks=None,
            max_new_tokens=max_new, eos_id=EOS, use_flash=False,
            paged_decode=False))[0]
        ref.append(_strip(toks))

    eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=4,
                       cache_capacity=64, eos_id=EOS, use_flash=False,
                       cache_dtype=jnp.float32)
    futs = []
    for i, p in enumerate(prompts):
        padded = np.zeros(16, np.int32)
        padded[:len(p)] = p
        mask = np.zeros((1, 16), np.float32)
        mask[0, :len(p)] = 1
        embeds = jnp.take(base["embed"], jnp.asarray(padded)[None], axis=0)
        kw = {} if i % 2 == 0 else {"temperature": 1.0, "top_k": 1}
        futs.append(eng.submit(embeds, mask, max_new_tokens=max_new, **kw))
    eng.run_until_drained()
    got = [_strip(f.get(timeout=1)) for f in futs]
    assert got == ref, (got, ref)


def test_engine_sampled_lane_terminates(model):
    """A genuinely stochastic lane (temperature 1, top_p 0.9) completes and
    respects its budget alongside greedy lanes."""
    base, adapters = model
    rng = np.random.default_rng(8)
    p = rng.integers(4, CFG.vocab_size, 6).astype(np.int32)
    padded = np.zeros(16, np.int32)
    padded[:6] = p
    mask = np.zeros((1, 16), np.float32)
    mask[0, :6] = 1
    embeds = jnp.take(base["embed"], jnp.asarray(padded)[None], axis=0)

    eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=2,
                       cache_capacity=64, eos_id=EOS, use_flash=False,
                       cache_dtype=jnp.float32, steps_per_dispatch=4)
    f1 = eng.submit(embeds, mask, max_new_tokens=10,
                    temperature=1.0, top_p=0.9)
    f2 = eng.submit(embeds, mask, max_new_tokens=10)
    eng.run_until_drained()
    t1, t2 = f1.get(timeout=1), f2.get(timeout=1)
    assert 1 <= len(t1) <= 10
    assert 1 <= len(t2) <= 10
    assert all(0 <= int(t) < CFG.vocab_size for t in t1)
