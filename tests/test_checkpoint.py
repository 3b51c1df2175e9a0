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


def test_non_lora_export_prefixes_and_reimport(tmp_path):
    """ADVICE r1 (high): non_lora_trainables.bin keys must carry the
    reference wrapper prefixes ('base_model.model.model.' stage-2 /
    'model.' stage-1 — finetune.py:197, pretrain.py:144-148) and the
    importer must accept any of them by substring match."""
    import torch
    cfg = ProjectorConfig(input_width=16, num_query_tokens=3,
                          qformer_hidden=24, d_model=32, tokens_per_group=4)
    trainable = {
        "vl_projector": init_projector_params(jax.random.key(4), cfg),
        "al_projector": init_projector_params(jax.random.key(5), cfg),
        "new_token_embeds": jax.random.normal(jax.random.key(6), (11, 32)),
    }

    # stage-2 export: peft-wrapped prefix
    out2 = str(tmp_path / "s2")
    ckpt.export_torch_artifacts(out2, trainable)
    sd2 = torch.load(f"{out2}/non_lora_trainables.bin", weights_only=True)
    assert all(k.startswith("base_model.model.model.") for k in sd2), \
        sorted(sd2)[:3]
    assert any(".vl_projector.visual_ln.weight" in k for k in sd2)

    # stage-1 export: unwrapped 'model.' prefix + trainable embed rows
    out1 = str(tmp_path / "s1")
    ckpt.export_torch_artifacts(out1, trainable, stage1=True)
    sd1 = torch.load(f"{out1}/non_lora_trainables.bin", weights_only=True)
    assert all(k.startswith("model.") for k in sd1), sorted(sd1)[:3]
    assert "model.embed_tokens.weight" in sd1
    assert tuple(sd1["model.embed_tokens.weight"].shape) == (11, 32)

    # reimport through the substring matcher recovers the projector exactly
    for sd in (sd2, sd1):
        sd_np = {k: v.numpy() for k, v in sd.items()}
        vl = imp.strip_to_submodule(sd_np, "vl_projector.")
        back = imp.import_projector(vl, cfg, kind="visual")
        flat_a = dict(jax.tree_util.tree_flatten_with_path(
            trainable["vl_projector"])[0])
        flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
        for k in flat_a:
            np.testing.assert_allclose(np.asarray(flat_b[k]),
                                       np.asarray(flat_a[k]), rtol=1e-6,
                                       err_msg=str(k))
