"""Paged decode attention vs eager cached attention (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moka_tpu.ops.attention import causal_bias, mha
from moka_tpu.ops.paged_decode import paged_decode_attention


@pytest.mark.parametrize("KH,G", [(2, 1), (2, 2)])
def test_paged_decode_matches_eager(KH, G):
    rng = np.random.default_rng(0)
    N, B, S, hd = 3, 2, 32, 8
    H = KH * G
    layer, cur = 1, 19  # valid slots: depends on mask below
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((N, B, S, KH, hd)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((N, B, S, KH, hd)), jnp.float32)
    mask = np.zeros((B, S), np.int32)
    mask[0, 3:cur + 1] = 1   # left-padded prompt
    mask[1, 0:cur + 1] = 1
    mask = jnp.asarray(mask)

    want = mha(q, ck[layer], cv[layer],
               causal_bias(mask, 1, S, q_offset=cur))
    got = paged_decode_attention(q, ck, cv, mask, layer, cur + 1,
                                 block_k=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_greedy_paged_unaligned_allocation():
    """paged_decode rounds the cache allocation up to a block multiple; the
    cache mask must cover the FULL allocation (regression: prompt+new not a
    multiple of 256 raised a shape error in the traced eager-bias path) and
    tokens must match the unpaged decoder."""
    from moka_tpu.core.config import LlamaConfig
    from moka_tpu.eval.decode import greedy_generate
    from moka_tpu.models import llama

    cfg = LlamaConfig.tiny()
    base = llama.init_llama_params(jax.random.key(0), cfg,
                                   dtype=jnp.float32)
    rng = np.random.default_rng(2)
    b, L = 2, 20  # L + 12 = 32, NOT a multiple of 256 -> S rounds to 256
    embeds = jnp.asarray(rng.standard_normal((b, L, cfg.dim)), jnp.float32)
    pmask = np.ones((b, L), np.float32)
    pmask[0, :5] = 0  # left padding
    pmask = jnp.asarray(pmask)
    kw = dict(cfg=cfg, spec=None, inputs_embeds=embeds, prompt_mask=pmask,
              masks=None, max_new_tokens=12, eos_id=10 ** 9, pad_id=0,
              use_flash=False)
    got = np.asarray(greedy_generate(base, None, paged_decode=True, **kw))
    want = np.asarray(greedy_generate(base, None, paged_decode=False, **kw))
    np.testing.assert_array_equal(got, want)


def test_paged_decode_skips_tail_blocks():
    """Values in cache slots beyond `length` must not affect the output."""
    rng = np.random.default_rng(1)
    N, B, S, KH, hd = 1, 1, 32, 2, 8
    q = jnp.asarray(rng.standard_normal((B, 1, KH, hd)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((N, B, S, KH, hd)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((N, B, S, KH, hd)), jnp.float32)
    mask = jnp.ones((B, S), jnp.int32)
    out1 = paged_decode_attention(q, ck, cv, mask, 0, 10, block_k=8,
                                  interpret=True)
    # poison the tail
    ck2 = ck.at[:, :, 10:].set(1e6)
    cv2 = cv.at[:, :, 10:].set(-1e6)
    out2 = paged_decode_attention(q, ck2, cv2, mask, 0, 10, block_k=8,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)
