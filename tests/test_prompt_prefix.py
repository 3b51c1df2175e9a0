"""Prompt tuning / prefix tuning compose with the decoder: shapes, gradient
flow, and prefix-attention actually changes outputs."""

import numpy as np
import jax
import jax.numpy as jnp

from moka_tpu.adapters.prompt import (apply_soft_prompt, init_prefix,
                                      init_soft_prompt, prefix_cache)
from moka_tpu.core.config import LlamaConfig
from moka_tpu.models import llama

CFG = LlamaConfig.tiny(vocab_size=64)


def _base():
    return llama.init_llama_params(jax.random.key(0), CFG, dtype=jnp.float32)


def test_soft_prompt_shapes_and_grad():
    base = _base()
    prompt = init_soft_prompt(jax.random.key(1), CFG, 4,
                              embed_table=base["embed"])
    b, L = 2, 8
    toks = jnp.arange(b * L).reshape(b, L) % 64
    embeds = jnp.take(base["embed"], toks, axis=0)
    labels = toks
    mask = jnp.ones((b, L), jnp.int32)

    def loss(p):
        e, m, lab, _ = apply_soft_prompt(p, embeds, mask, labels)
        logits, _ = llama.forward(base, CFG, inputs_embeds=e, attn_mask=m)
        return llama.cross_entropy_loss(logits, lab)

    val, g = jax.value_and_grad(loss)(prompt)
    assert np.isfinite(float(val))
    assert float(jnp.abs(g).sum()) > 0


def test_prefix_tuning_changes_logits_and_grads():
    base = _base()
    prefix = init_prefix(jax.random.key(2), CFG, n_prefix=3)
    b, L = 2, 8
    toks = (jnp.arange(b * L).reshape(b, L) * 3 + 1) % 64

    def forward_with_prefix(pfx):
        cache, pmask = prefix_cache(pfx, CFG, b, L, dtype=jnp.float32)
        attn = jnp.concatenate([pmask, jnp.ones((b, L), jnp.int32)], axis=1)
        logits, _ = llama.forward(
            base, CFG, tokens=toks, cache=cache, attn_mask=attn,
            positions=jnp.broadcast_to(jnp.arange(L) + 3, (b, L)))
        return logits

    logits_p = forward_with_prefix(prefix)
    logits_0, _ = llama.forward(base, CFG, tokens=toks)
    assert float(jnp.abs(logits_p - logits_0).max()) > 1e-4

    g = jax.grad(lambda p: jnp.sum(forward_with_prefix(p) ** 2))(prefix)
    assert float(jnp.abs(g["k"]).sum()) > 0
    assert float(jnp.abs(g["v"]).sum()) > 0


def test_ptuning_prompt_shape_and_grad():
    from moka_tpu.adapters.prompt import (apply_soft_prompt,
                                          init_ptuning_encoder,
                                          ptuning_prompt)
    base = _base()
    enc = init_ptuning_encoder(jax.random.key(5), CFG, n_tokens=3)
    b, L = 2, 6
    toks = jnp.arange(b * L).reshape(b, L) % 64
    embeds = jnp.take(base["embed"], toks, axis=0)

    def loss(p):
        prompt = ptuning_prompt(p)
        e, _, _, _ = apply_soft_prompt(prompt, embeds)
        logits, _ = llama.forward(base, CFG, inputs_embeds=e)
        return jnp.sum(logits ** 2)

    g = jax.grad(loss)(enc)
    assert all(float(jnp.abs(v).sum()) > 0 for v in jax.tree.leaves(g))


def test_ln_tuning_split_merge():
    from moka_tpu.adapters.prompt import ln_tuning_merge, ln_tuning_split
    base = _base()
    norms, frozen = ln_tuning_split(base)
    toks = jnp.arange(12).reshape(2, 6) % 64

    def loss(n):
        merged = ln_tuning_merge(n, frozen)
        logits, _ = llama.forward(merged, CFG, tokens=toks)
        return jnp.sum(logits ** 2)

    g = jax.grad(loss)(norms)
    assert float(jnp.abs(g["attn_norm"]).sum()) > 0
    assert float(jnp.abs(g["final_norm"]).sum()) > 0
