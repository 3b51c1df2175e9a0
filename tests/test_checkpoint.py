"""Checkpoint round-trips: orbax save/restore resumes training exactly;
torch export -> import recovers the adapter/projector pytrees."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moka_tpu.core.config import LlamaConfig, TrainConfig
from moka_tpu.models import llama
from moka_tpu.models.projectors import ProjectorConfig, init_projector_params
from moka_tpu.ops.moka import MokaSpec
from moka_tpu.train import checkpoint as ckpt
from moka_tpu.train import import_torch as imp
from moka_tpu.train.objectives import make_llama_moka_loss
from moka_tpu.train.optim import make_optimizer
from moka_tpu.train.step import init_train_state, make_train_step

CFG = LlamaConfig.tiny(vocab_size=64)
SPEC = MokaSpec.avt(rank=4, dropout_rate=0.0)


def _batch():
    rng = np.random.default_rng(0)
    toks = rng.integers(4, 64, (2, 16)).astype(np.int32)
    return {"tokens": jnp.asarray(toks), "labels": jnp.asarray(toks)}


def test_orbax_roundtrip_resume(tmp_path):
    r1, r2 = jax.random.split(jax.random.key(0))
    frozen = llama.init_llama_params(r1, CFG, dtype=jnp.float32)
    trainable = {"adapters": llama.init_moka_adapters(r2, CFG, SPEC)}
    tx = make_optimizer(TrainConfig(learning_rate=1e-3, warmup_ratio=0.0),
                        total_steps=20)
    step = make_train_step(make_llama_moka_loss(CFG, SPEC, remat=False), tx,
                           donate=False)
    state = init_train_state(trainable, tx, jax.random.key(1))
    batch = _batch()
    for _ in range(3):
        state, _ = step(state, frozen, batch)
    ckpt.save(str(tmp_path / "run"), state)
    assert ckpt.latest_step(str(tmp_path / "run")) == 3

    # continue two more steps from live state
    live = state
    for _ in range(2):
        live, m_live = step(live, frozen, batch)

    # restore and continue the same two steps
    template = init_train_state(
        {"adapters": llama.init_moka_adapters(jax.random.key(9), CFG, SPEC)},
        tx, jax.random.key(1))
    restored = ckpt.restore(str(tmp_path / "run"), template)
    assert int(restored.step) == 3
    for _ in range(2):
        restored, m_res = step(restored, frozen, batch)
    np.testing.assert_allclose(float(m_res["loss"]), float(m_live["loss"]),
                               rtol=1e-6)


def test_adapter_torch_roundtrip():
    adapters = llama.init_moka_adapters(jax.random.key(3), CFG, SPEC)
    adapters = jax.tree.map(
        lambda x: x + jax.random.normal(jax.random.key(1), x.shape) * 0.1,
        adapters)
    sd = ckpt.adapters_to_torch_state_dict(adapters)
    back = imp.import_moka_adapters_avt(sd, CFG, SPEC.num_modalities,
                                        SPEC.rank)
    for name in adapters["layers"]:
        np.testing.assert_allclose(
            np.asarray(back["layers"][name]["a"]),
            np.asarray(adapters["layers"][name]["a"]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(back["layers"][name]["b"]),
            np.asarray(adapters["layers"][name]["b"]), rtol=1e-6)


def test_projector_torch_roundtrip():
    cfg = ProjectorConfig(input_width=16, num_query_tokens=3,
                          qformer_hidden=24, d_model=32, tokens_per_group=4)
    proj = init_projector_params(jax.random.key(4), cfg)
    sd = ckpt.projector_to_torch_state_dict(proj, kind="visual")
    back = imp.import_projector(sd, cfg, kind="visual")

    flat_a = dict(jax.tree_util.tree_flatten_with_path(proj)[0])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    assert set(map(str, flat_a)) == set(map(str, flat_b))
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_b[k]),
                                   np.asarray(flat_a[k]), rtol=1e-6,
                                   err_msg=str(k))
