"""int8 KV cache: quantized-layout parity across every cache consumer.

The quantized cache (``llama.init_kv_cache(quantized=True)``) halves decode
cache HBM traffic — the decode bound at 7B (PERFORMANCE.md).  These tests pin
(a) the quantize/dequant roundtrip error bound, (b) exact math parity of the
paged block loop on a quantized cache vs the plain kernel on the dequantized
values, (c) greedy token parity int8-cache vs fp32-cache at tiny scale (eager,
flash-less paged, and sampled), and (d) the serving engine end-to-end with
insert/compact on the {"q","s"} layout.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moka_tpu.core.config import LlamaConfig
from moka_tpu.eval.decode import greedy_generate
from moka_tpu.models import llama
from moka_tpu.ops.moka import MokaSpec
from moka_tpu.ops.paged_decode import paged_decode_attention

CFG = LlamaConfig.tiny()
SPEC = MokaSpec.avt(rank=4, dropout_rate=0.0)


def test_kv_quantize_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 3, 16)) * 3.0, jnp.float32)
    q, s = llama._kv_quantize(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 5, 3, 1)
    back = q.astype(jnp.float32) * s
    # per-row max-abs scaling: error <= s/2 = max|x| / 254 per row
    err = np.max(np.abs(np.asarray(back - x)), axis=-1)
    bound = np.max(np.abs(np.asarray(x)), axis=-1) / 254 + 1e-7
    assert (err <= bound).all()
    # all-zero rows quantize exactly (scale guard)
    q0, s0 = llama._kv_quantize(jnp.zeros((1, 1, 1, 8)))
    assert np.asarray(q0).sum() == 0 and np.asarray(s0).item() == 1.0


def test_paged_decode_quantized_matches_dequant():
    """Block loop on {"q","s"} == block loop on the dequantized arrays."""
    rng = np.random.default_rng(1)
    N, B, S, KH, G, hd = 2, 2, 32, 2, 2, 8
    H = KH * G
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((N, B, S, KH, hd)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((N, B, S, KH, hd)), jnp.float32)
    kq, ks = llama._kv_quantize(ck)
    vq, vs = llama._kv_quantize(cv)
    mask = np.zeros((B, S), np.int32)
    mask[0, 3:20] = 1
    mask[1, :20] = 1
    mask = jnp.asarray(mask)
    got = paged_decode_attention(q, {"q": kq, "s": ks}, {"q": vq, "s": vs},
                                 mask, 1, 20, block_k=8)
    want = paged_decode_attention(q, kq.astype(jnp.float32) * ks,
                                  vq.astype(jnp.float32) * vs,
                                  mask, 1, 20, block_k=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def model():
    r1, r2 = jax.random.split(jax.random.key(0))
    base = llama.init_llama_params(r1, CFG, dtype=jnp.float32)
    adapters = llama.init_moka_adapters(r2, CFG, SPEC)
    adapters = jax.tree.map(lambda x: x + 0.01 if x.ndim == 3 else x,
                            adapters)
    return base, adapters


def _gen(model, kv_quant, paged=False, seed=3, max_new=12):
    base, adapters = model
    rng = np.random.default_rng(seed)
    b, L = 2, 20
    embeds = jnp.asarray(rng.standard_normal((b, L, CFG.dim)), jnp.float32)
    pmask = np.ones((b, L), np.float32)
    pmask[0, :5] = 0  # left padding
    return np.asarray(greedy_generate(
        base, adapters, cfg=CFG, spec=SPEC, inputs_embeds=embeds,
        prompt_mask=jnp.asarray(pmask), masks=None, max_new_tokens=max_new,
        eos_id=10 ** 9, pad_id=0, use_flash=False, paged_decode=paged,
        kv_quant=kv_quant))


def test_greedy_kv_quant_matches_plain(model):
    """Greedy tokens with the int8 cache == fp32 cache at tiny scale (the
    per-(token, head) quantization error is far below argmax gaps here)."""
    np.testing.assert_array_equal(_gen(model, True), _gen(model, False))


def test_greedy_kv_quant_paged_matches_eager(model):
    """Paged block loop and eager attention agree on the SAME int8 cache."""
    np.testing.assert_array_equal(_gen(model, True, paged=True),
                                  _gen(model, True, paged=False))


def test_engine_kv_quant_matches_plain(model):
    """End-to-end serving on the quantized cache: prefill -> _insert ->
    _step(+paged) -> _compact all handle the {"q","s"} layout; tokens match
    the plain-cache engine."""
    from moka_tpu.eval.engine import DecodeEngine
    base, adapters = model
    rng = np.random.default_rng(4)
    prompts = [rng.integers(4, CFG.vocab_size,
                            rng.integers(4, 10)).astype(np.int32)
               for _ in range(5)]

    def run(kv_quant, paged):
        eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=2,
                           cache_capacity=32, eos_id=2, use_flash=False,
                           paged_decode=paged, kv_quant=kv_quant)
        waiters = []
        for p in prompts:
            padded = np.zeros(16, np.int32)
            padded[:len(p)] = p
            embeds = jnp.take(base["embed"], jnp.asarray(padded)[None],
                              axis=0)
            mask = np.zeros((1, 16), np.float32)
            mask[0, :len(p)] = 1
            waiters.append(eng.submit(embeds, mask, max_new_tokens=10))
        eng.run_until_drained()
        return [w.get(timeout=5).tolist() for w in waiters]

    got = run(True, paged=False)
    assert run(False, paged=False) == got
    # compaction + paged block loop on the quantized layout
    assert run(True, paged=True) == got
