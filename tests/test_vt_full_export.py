"""Full VT ``model.safetensors`` export vs the reference model itself.

The reference eval drivers rebuild PeftMixedModel(LlavaForConditionalGeneration)
and ``load_state_dict(sd, strict=True)`` (``mmbench.py:576-577``) — strict
means the export must carry EVERY key (frozen CLIP tower, llama base under
``.base_layer``, lm_head, projector, both dual adapters, vendored-Bert
buffers/heads) with exact names and shapes.  These tests build the actual
reference model at tiny config (``tests/_vt_ref.py``) and:

  1. strict-load our export into it,
  2. push the loaded weights back out through our importers and assert the
     round-trip is exact,
  3. run the reference language model's frozen projections against our
     dequantized-export weights for numerical identity.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tests")

from moka_tpu.models import llava
from moka_tpu.ops.moka import MokaSpec
from moka_tpu.train import checkpoint as ckpt
from moka_tpu.train import import_torch as imp


def _tiny_vt_cfg():
    import dataclasses
    from moka_tpu.core.config import LlamaConfig
    from moka_tpu.models.clip_vit import ClipVitConfig
    from moka_tpu.models.projectors import ProjectorConfig

    lcfg = LlamaConfig(vocab_size=64, dim=32, n_layers=2, n_heads=4,
                       n_kv_heads=4, intermediate=64)
    return llava.LlavaConfig(
        llama=lcfg,
        clip=ClipVitConfig(image_size=28, patch_size=14, hidden=32,
                           n_layers=2, n_heads=4, intermediate=64),
        projector=ProjectorConfig(input_width=32, num_query_tokens=3,
                                  qformer_hidden=32, qformer_heads=4,
                                  qformer_intermediate=64,
                                  d_model=32, tokens_per_group=4),
        spec=MokaSpec.vt(rank=4, lora_alpha=16.0, attn_weight=0.05,
                         dropout_rate=0.0),
    )


@pytest.fixture(scope="module")
def ref_and_ours(tmp_path_factory):
    from _vt_ref import build_reference_vt
    tmp = str(tmp_path_factory.mktemp("vtref"))
    ref, _ = build_reference_vt(tmp)
    cfg = _tiny_vt_cfg()
    k1, k2 = jax.random.split(jax.random.key(7))
    frozen = llava.init_frozen(k1, cfg, dtype=jnp.float32)
    trainable = llava.init_trainable(k2, cfg)
    # non-zero B so the adapter keys carry signal
    trainable["adapters"] = jax.tree.map(
        lambda x: x + 0.1 * jax.random.normal(jax.random.key(3), x.shape),
        trainable["adapters"])
    return ref, cfg, frozen, trainable


def test_full_export_strict_load(ref_and_ours):
    ref, cfg, frozen, trainable = ref_and_ours
    sd = ckpt.export_vt_full_state_dict(trainable, frozen, cfg)
    want_keys = set(ref.state_dict().keys())
    got_keys = set(sd.keys())
    assert got_keys == want_keys, (
        f"missing={sorted(want_keys - got_keys)[:5]} "
        f"extra={sorted(got_keys - want_keys)[:5]}")
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
               sd.items()}
    # the strict load the eval drivers perform
    ref.load_state_dict(tensors, strict=True)


def test_full_export_roundtrip_through_importers(ref_and_ours):
    """Export -> reference state dict -> our importers == original trees."""
    ref, cfg, frozen, trainable = ref_and_ours
    sd = ckpt.export_vt_full_state_dict(trainable, frozen, cfg)

    # llama base: strip to the language_model submodule, rename base_layer
    lm = imp.strip_to_submodule(sd, "language_model.")
    lm = {k.replace(".base_layer.weight", ".weight"): v
          for k, v in lm.items()}
    lm = {f"model.{k}": v for k, v in lm.items()}
    lm["lm_head.weight"] = sd["base_model.model.lm_head.weight"]
    base_back = imp.import_llama(lm, cfg.llama, dtype=jnp.float32)
    for path in ("embed", "final_norm", "lm_head"):
        np.testing.assert_allclose(np.asarray(base_back[path]),
                                   np.asarray(frozen["llama"][path]),
                                   rtol=1e-6, err_msg=path)
    for name in ("q", "o", "gate", "down"):
        np.testing.assert_allclose(
            np.asarray(base_back["layers"][name]),
            np.asarray(frozen["llama"]["layers"][name]), rtol=1e-6,
            err_msg=name)

    # CLIP tower
    clip_sd = imp.strip_to_submodule(sd, "vision_tower.")
    clip_back = imp.import_clip(clip_sd, cfg.clip)
    flat_a = dict(jax.tree_util.tree_flatten_with_path(frozen["clip"])[0])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(clip_back)[0])
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_b[k]),
                                   np.asarray(flat_a[k]), rtol=1e-6,
                                   atol=1e-6, err_msg=str(k))

    # projector + adapters through the VT trainable importer
    back = imp.import_vt_trainable(sd, cfg, {})
    for name, p in trainable["adapters"]["layers"].items():
        np.testing.assert_allclose(
            np.asarray(back["adapters"]["layers"][name]["a"]),
            np.asarray(p["a"]), rtol=1e-6, err_msg=name)
        np.testing.assert_allclose(
            np.asarray(back["adapters"]["layers"][name]["b"]),
            np.asarray(p["b"]), rtol=1e-6, err_msg=name)
    flat_a = dict(jax.tree_util.tree_flatten_with_path(
        trainable["projector"])[0])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(
        back["projector"])[0])
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_b[k]),
                                   np.asarray(flat_a[k]), rtol=1e-6,
                                   atol=1e-6, err_msg=str(k))


def test_loaded_reference_projection_numerics(ref_and_ours):
    """After strict-loading our export, one wrapped projection of the
    reference model computes base @ x + MokA delta == our moka_linear."""
    ref, cfg, frozen, trainable = ref_and_ours
    sd = ckpt.export_vt_full_state_dict(trainable, frozen, cfg)
    ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=True)
    ref = ref.float()
    ref.eval()  # the recipe carries lora_dropout=0.05; disable for parity

    layer0 = ref.base_model.model.model.language_model.layers[0]
    lin = layer0.self_attn.q_proj
    rng = np.random.default_rng(0)
    b, L, d = 2, 12, cfg.llama.dim
    x = rng.standard_normal((b, L, d)).astype(np.float32)
    text = np.zeros((b, L), np.float32)
    image = np.zeros((b, L), np.float32)
    question = np.zeros((b, L), np.float32)
    image[:, 2:6] = 1
    text[:, :] = 1 - image
    question[:, 8:11] = 1
    with torch.no_grad():
        want = lin(torch.from_numpy(x),
                   torch.from_numpy(text[..., None]),
                   torch.from_numpy(image[..., None]),
                   torch.from_numpy(question[..., None])).numpy()

    from moka_tpu.ops.moka import moka_linear
    a = trainable["adapters"]["layers"]["q"]
    got = moka_linear(
        jnp.asarray(x), jnp.asarray(frozen["llama"]["layers"]["q"][0]),
        jnp.asarray(a["a"][0]), jnp.asarray(a["b"][0]),
        jnp.asarray(np.stack([text, image])), jnp.asarray(question),
        cfg.spec)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
