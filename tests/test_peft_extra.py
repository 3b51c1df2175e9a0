"""Parity of the round-2 PEFT additions vs upstream PEFT math.

poly and multitask-prompt-tuning run against the INSTALLED peft package's
own modules (the reference vendors the same tuners in
``modified_peft/tuners/{poly,multitask_prompt_tuning}``); adaption_prompt
is checked against a line-for-line torch transcription of
``adaption_prompt/layer.py`` AdaptedAttention.forward's adapter math
(the module itself needs a live transformers attention block to
instantiate).  The AdaLoRA trainer hook test lives in
``test_trainer.py``-style form here: budget enforcement across steps.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from moka_tpu.adapters import peft as apeft
from moka_tpu.adapters import prompt as aprompt
from moka_tpu.core.config import LlamaConfig


# ---------------------------------------------------------------- poly ----

def test_poly_parity_vs_upstream():
    from peft import PolyConfig
    from peft.tuners.poly.layer import Linear as PolyTorch

    d_in, d_out, b, L = 16, 12, 3, 7
    cfg = PolyConfig(r=4, n_tasks=5, n_skills=3, n_splits=2)
    torch.manual_seed(0)
    base = torch.nn.Linear(d_in, d_out, bias=False)
    ref = PolyTorch(base, "default", cfg)
    with torch.no_grad():
        ref.poly_lora_A["default"].normal_(0, 0.5)
        ref.poly_lora_B["default"].normal_(0, 0.5)
        ref.poly_router["default"].module_logits.normal_(0, 0.5)
    ref.eval()  # deterministic router (sigmoid, no RelaxedBernoulli)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, L, d_in)).astype(np.float32)
    task_ids = np.asarray([0, 3, 4])
    with torch.no_grad():
        want = ref(torch.from_numpy(x),
                   task_ids=torch.from_numpy(task_ids)).numpy()

    spec = apeft.PolySpec(n_tasks=5, n_skills=3, n_splits=2, rank=4)
    p = {"a": jnp.asarray(ref.poly_lora_A["default"].detach().numpy()),
         "b": jnp.asarray(ref.poly_lora_B["default"].detach().numpy()),
         "router": jnp.asarray(
             ref.poly_router["default"].module_logits.detach().numpy())}
    got = apeft.poly_linear(jnp.asarray(x),
                            jnp.asarray(base.weight.detach().numpy().T),
                            p, jnp.asarray(task_ids), spec)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_poly_train_mixing_is_normalized_and_stochastic():
    spec = apeft.PolySpec(n_tasks=2, n_skills=4, n_splits=1, rank=4)
    router = jax.random.normal(jax.random.key(0), (2, 4))
    ids = jnp.asarray([0, 1, 1])
    w1 = apeft.poly_mixing_weights(router, ids, spec, rng=jax.random.key(1))
    w2 = apeft.poly_mixing_weights(router, ids, spec, rng=jax.random.key(2))
    np.testing.assert_allclose(np.asarray(jnp.sum(w1, -1)), 1.0, rtol=1e-5)
    assert not np.allclose(np.asarray(w1), np.asarray(w2))  # resampled
    weval = apeft.poly_mixing_weights(router, ids, spec, rng=None)
    s = jax.nn.sigmoid(router[ids]).reshape(3, 1, 4)
    np.testing.assert_allclose(np.asarray(weval),
                               np.asarray(s / jnp.sum(s, -1, keepdims=True)),
                               rtol=1e-5)


# ------------------------------------------- multitask prompt tuning ----

def test_multitask_prompt_parity_vs_upstream():
    from peft import MultitaskPromptTuningConfig
    from peft.tuners.multitask_prompt_tuning.model import (
        MultitaskPromptEmbedding)

    dim, n_tokens, n_tasks, vocab = 16, 5, 3, 50
    cfg = MultitaskPromptTuningConfig(
        num_virtual_tokens=n_tokens, token_dim=dim, num_tasks=n_tasks,
        num_transformer_submodules=1, task_type="CAUSAL_LM")
    torch.manual_seed(1)
    word_emb = torch.nn.Embedding(vocab, dim)
    ref = MultitaskPromptEmbedding(cfg, word_emb)
    with torch.no_grad():
        ref.embedding.weight.normal_(0, 0.5)
        ref.prefix_task_cols.normal_(0, 0.5)
        ref.prefix_task_rows.normal_(0, 0.5)

    task_ids = np.asarray([2, 0])
    indices = np.tile(np.arange(n_tokens), (2, 1))
    with torch.no_grad():
        want = ref(torch.from_numpy(indices),
                   torch.from_numpy(task_ids)).numpy()

    p = {"prompt": jnp.asarray(ref.embedding.weight.detach().numpy()),
         "task_cols": jnp.asarray(ref.prefix_task_cols.detach().numpy()),
         "task_rows": jnp.asarray(ref.prefix_task_rows.detach().numpy())}
    got = aprompt.multitask_prompt(p, jnp.asarray(task_ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_apply_multitask_prompt_extends_aux():
    cfg = LlamaConfig.tiny(vocab_size=32)
    p = aprompt.init_multitask_prompt(jax.random.key(0), cfg, n_tokens=3,
                                      n_tasks=2)
    b, L = 2, 6
    embeds = jnp.zeros((b, L, cfg.dim))
    am = jnp.ones((b, L), jnp.int32)
    labels = jnp.zeros((b, L), jnp.int32)
    pos = jnp.tile(jnp.arange(L), (b, 1))
    e2, am2, lab2, pos2 = aprompt.apply_multitask_prompt(
        p, jnp.asarray([0, 1]), embeds, am, labels, pos)
    assert e2.shape == (b, L + 3, cfg.dim)
    assert int(jnp.sum(am2)) == b * (L + 3)
    assert np.all(np.asarray(lab2[:, :3]) == -100)
    assert np.all(np.asarray(pos2[:, 3]) == 3)


# ------------------------------------------------- adaption prompt ------

def test_adaption_prompt_parity_vs_upstream_math():
    """Line-for-line torch transcription of AdaptedAttention.forward
    (``adaption_prompt/layer.py:80-125``) vs the pure function."""
    b, L, H, K, hd, dim, al = 2, 6, 4, 2, 8, 32, 3
    rng = np.random.default_rng(3)
    q = rng.standard_normal((b, L, H, hd)).astype(np.float32)  # roped q
    prompt = rng.standard_normal((al, dim)).astype(np.float32)
    k_w = rng.standard_normal((dim, K * hd)).astype(np.float32)
    v_w = rng.standard_normal((dim, K * hd)).astype(np.float32)
    o_w = rng.standard_normal((H * hd, dim)).astype(np.float32)
    gate = 0.37

    # --- upstream transcription (torch) ---
    tq = torch.from_numpy(q).permute(0, 2, 1, 3)          # (b,H,L,hd)
    key = torch.from_numpy(prompt) @ torch.from_numpy(k_w)
    value = torch.from_numpy(prompt) @ torch.from_numpy(v_w)
    factor = H // K
    ak = key.view(1, al, K, hd).repeat(b, 1, 1, 1).transpose(1, 2)
    av = value.view(1, al, K, hd).repeat(b, 1, 1, 1).transpose(1, 2)
    ak = torch.repeat_interleave(ak, repeats=factor, dim=1)
    av = torch.repeat_interleave(av, repeats=factor, dim=1)
    scores = torch.matmul(tq, ak.transpose(2, 3)) / math.sqrt(hd)
    scores = gate * torch.softmax(scores, dim=-1, dtype=torch.float32)
    adapter_out = torch.matmul(scores, av).transpose(1, 2).reshape(b, L, -1)
    want = (adapter_out @ torch.from_numpy(o_w)).numpy()

    got = aprompt.adaption_prompt_delta(
        jnp.asarray(q), jnp.asarray(prompt), jnp.float32(gate),
        jnp.asarray(k_w), jnp.asarray(v_w), jnp.asarray(o_w))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_adaption_prompt_zero_gate_is_identity():
    cfg = LlamaConfig.tiny(vocab_size=32)
    p = aprompt.init_adaption_prompt(jax.random.key(0), cfg, adapter_len=4,
                                     adapter_layers=2)
    assert np.all(np.asarray(p["gate"]) == 0.0)
    q = jax.random.normal(jax.random.key(1), (1, 5, cfg.n_heads,
                                              cfg.head_dim))
    kw = jax.random.normal(jax.random.key(2),
                           (cfg.dim, cfg.n_kv_heads * cfg.head_dim))
    ow = jax.random.normal(jax.random.key(3),
                           (cfg.n_heads * cfg.head_dim, cfg.dim))
    out = aprompt.adaption_prompt_delta(q, p["prompt"][0], p["gate"][0],
                                        kw, kw, ow)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


# ------------------------------------------------ AdaLoRA trainer hook ----

def test_adalora_trainer_budget_enforcement(tmp_path):
    """Trainer with adalora_budget re-allocates the global rank budget every
    N steps: after training, exactly `budget` singular directions stay
    unmasked across all AdaLoRA-adapted layers (VERDICT r1 item 7)."""
    from moka_tpu.core.config import TrainConfig
    from moka_tpu.train.trainer import Trainer

    spec = apeft.AdaLoraSpec(init_rank=6, target_rank=2)
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    d = 8
    frozen = {"w1": jax.random.normal(k1, (d, d)) * 0.3,
              "w2": jax.random.normal(k2, (d, d)) * 0.3}
    trainable = {"l1": apeft.init_adalora(k3, d, d, spec),
                 "l2": apeft.init_adalora(jax.random.key(9), d, d, spec)}
    # non-zero lam so importances differ
    for key in ("l1", "l2"):
        trainable[key]["lam"] = jax.random.normal(
            jax.random.key(hash(key) % 100), (spec.init_rank,)) * 0.1

    def loss_fn(tr, fr, batch, rng):
        h = apeft.adalora_linear(batch["x"], fr["w1"], tr["l1"])
        h = jax.nn.tanh(h)
        out = apeft.adalora_linear(h, fr["w2"], tr["l2"])
        return jnp.mean((out - batch["y"]) ** 2), {}

    budget = 4
    cfg = TrainConfig(learning_rate=1e-2, adalora_budget=budget,
                      adalora_update_every=3, log_every=100,
                      output_dir=str(tmp_path / "run"))
    trainer = Trainer(loss_fn, trainable, frozen, cfg, total_steps=7)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, d)), jnp.float32)
    batches = ({"x": x, "y": jnp.tanh(x @ frozen["w1"]) @ frozen["w2"]}
               for _ in range(7))
    state = trainer.train(batches)
    total = sum(float(jnp.sum(state.params[k]["mask"])) for k in
                ("l1", "l2"))
    assert total == budget, total
    # masks are 0/1
    for k in ("l1", "l2"):
        m = np.asarray(state.params[k]["mask"])
        assert set(np.unique(m)) <= {0.0, 1.0}
