"""End-to-end slices: adapter training reduces loss (single-device and on an
8-device FSDP+TP mesh), and the greedy decode loop behaves."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from moka_tpu.core.config import LlamaConfig, MeshConfig, TrainConfig
from moka_tpu.eval.decode import greedy_generate
from moka_tpu.models import llama
from moka_tpu.ops.moka import MokaSpec
from moka_tpu.parallel import mesh as meshlib
from moka_tpu.parallel import sharding as shardlib
from moka_tpu.train.objectives import make_llama_moka_loss
from moka_tpu.train.optim import make_optimizer
from moka_tpu.train.step import init_train_state, make_train_step

CFG = LlamaConfig.tiny(vocab_size=128)
SPEC = MokaSpec.avt(rank=4, dropout_rate=0.0)


def _batch(b=4, L=32, seed=0):
    rng = np.random.default_rng(seed)
    toks = rng.integers(4, CFG.vocab_size, (b, L)).astype(np.int32)
    labels = toks.copy()
    labels[:, : L // 4] = -100
    mod = np.zeros((3, b, L), np.float32)
    mod[0, :, : L // 2] = 1
    mod[1, :, L // 2: 3 * L // 4] = 1
    mod[2, :, 3 * L // 4:] = 1
    q = np.zeros((b, L), np.float32)
    q[:, 2:6] = 1
    return {"tokens": jnp.asarray(toks), "labels": jnp.asarray(labels),
            "modality_masks": jnp.asarray(mod), "question_mask": jnp.asarray(q)}


def _setup(seed=0):
    r1, r2 = jax.random.split(jax.random.key(seed))
    frozen = llama.init_llama_params(r1, CFG, dtype=jnp.float32)
    trainable = {"adapters": llama.init_moka_adapters(r2, CFG, SPEC)}
    return frozen, trainable


def test_loss_decreases():
    frozen, trainable = _setup()
    tcfg = TrainConfig(learning_rate=5e-3, warmup_ratio=0.0,
                       lr_schedule="constant", max_grad_norm=1.0)
    tx = make_optimizer(tcfg, total_steps=50)
    loss_fn = make_llama_moka_loss(CFG, SPEC, remat=True)
    step = make_train_step(loss_fn, tx)
    state = init_train_state(trainable, tx, jax.random.key(0))
    batch = _batch()
    losses = []
    for _ in range(30):
        state, m = step(state, frozen, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.1, losses[::10]


def test_sharded_train_step_matches_single_device():
    """FSDP+TP mesh (1 data, 4 fsdp, 2 model): same loss as unsharded."""
    devs = jax.devices()
    assert len(devs) == 8, "conftest must provide 8 virtual devices"
    mesh = meshlib.make_mesh(MeshConfig(data=1, fsdp=4, model=2))

    frozen, trainable = _setup()
    tcfg = TrainConfig(learning_rate=1e-3, warmup_ratio=0.0,
                       lr_schedule="constant")
    tx = make_optimizer(tcfg, total_steps=10)
    loss_fn = make_llama_moka_loss(CFG, SPEC, remat=False)
    step = make_train_step(loss_fn, tx, donate=False)
    batch = _batch()

    # single-device reference
    state0 = init_train_state(trainable, tx, jax.random.key(0))
    _, m_ref = step(state0, frozen, batch)

    # sharded: frozen params per rule table, batch over data axes, state
    # replicated
    frozen_sh = shardlib.shard_params(mesh, frozen)
    batch_sh = jax.device_put(batch, NamedSharding(mesh, P()))
    bsh = meshlib.batch_sharding(mesh)
    batch_sh["tokens"] = jax.device_put(batch["tokens"], bsh)
    batch_sh["labels"] = jax.device_put(batch["labels"], bsh)
    state_sh = jax.device_put(init_train_state(trainable, tx,
                                               jax.random.key(0)),
                              NamedSharding(mesh, P()))
    _, m_sh = step(state_sh, frozen_sh, batch_sh)
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)


def test_greedy_generate_shapes_and_eos():
    frozen, trainable = _setup()
    b, L, new = 2, 12, 6
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.standard_normal((b, L, CFG.dim)).astype(np.float32))
    pmask = np.ones((b, L), np.int32)
    pmask[0, :3] = 0  # left padding
    toks = greedy_generate(
        frozen, trainable["adapters"], cfg=CFG, spec=SPEC,
        inputs_embeds=embeds, prompt_mask=jnp.asarray(pmask), masks=None,
        max_new_tokens=new, eos_id=2, pad_id=0)
    assert toks.shape == (b, new)
    toks = np.asarray(toks)
    # after an eos, everything must be pad or eos-then-pad
    for i in range(b):
        seen = False
        for t in toks[i]:
            if seen:
                assert t == 0
            if t == 2:
                seen = True


def test_greedy_matches_stepwise_forward():
    """Generation must equal manual argmax rollout with the plain forward."""
    frozen, trainable = _setup(seed=3)
    b, L, new = 2, 8, 5
    rng = np.random.default_rng(1)
    embeds = jnp.asarray(rng.standard_normal((b, L, CFG.dim)).astype(np.float32))
    pmask = jnp.ones((b, L), jnp.int32)
    got = np.asarray(greedy_generate(
        frozen, trainable["adapters"], cfg=CFG, spec=SPEC,
        inputs_embeds=embeds, prompt_mask=pmask, masks=None,
        max_new_tokens=new, eos_id=10**6, pad_id=0))

    # manual rollout, re-running the full (uncached) forward each step
    cur = embeds
    want = []
    for t in range(new):
        logits, _ = llama.forward(frozen, CFG,
                                  adapters=trainable["adapters"], spec=SPEC,
                                  inputs_embeds=cur)
        nxt = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1))
        want.append(nxt)
        cur = jnp.concatenate(
            [cur, jnp.take(frozen["embed"], jnp.asarray(nxt)[:, None],
                           axis=0)], axis=1)
    want = np.stack(want, axis=1)
    np.testing.assert_array_equal(got, want)


def test_sharded_generate_matches_single_device():
    """Greedy generation with the frozen base FSDP+TP-sharded produces the
    same tokens as unsharded — the whole decode loop (prefill, cache
    updates, argmax) is sharding-transparent."""
    frozen, trainable = _setup(seed=5)
    b, L, new = 2, 12, 5
    rng = np.random.default_rng(3)
    embeds = jnp.asarray(rng.standard_normal((b, L, CFG.dim)).astype(np.float32))
    pmask = jnp.ones((b, L), jnp.int32)

    want = np.asarray(greedy_generate(
        frozen, trainable["adapters"], cfg=CFG, spec=SPEC,
        inputs_embeds=embeds, prompt_mask=pmask, masks=None,
        max_new_tokens=new, eos_id=10 ** 6, pad_id=0))

    mesh = meshlib.make_mesh(MeshConfig(data=1, fsdp=4, model=2))
    frozen_sh = shardlib.shard_params(mesh, frozen)
    ad_sh = jax.device_put(trainable["adapters"], NamedSharding(mesh, P()))
    got = np.asarray(greedy_generate(
        frozen_sh, ad_sh, cfg=CFG, spec=SPEC,
        inputs_embeds=jax.device_put(embeds, NamedSharding(mesh, P())),
        prompt_mask=jax.device_put(pmask, NamedSharding(mesh, P())),
        masks=None, max_new_tokens=new, eos_id=10 ** 6, pad_id=0))
    np.testing.assert_array_equal(got, want)
