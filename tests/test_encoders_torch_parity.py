"""Numerical parity of the JAX encoders against torch implementations.

  * CLIP tower vs HF ``CLIPVisionModel`` (the exact class the reference
    wraps, ``multimodal_encoder.py:44``) on random weights, through the
    checkpoint importer.
  * Q-Former vs HF ``InstructBlipQFormerModel`` (the same BLIP-2
    architecture the reference vendors in ``models/Qformer.py``: query
    tokens + per-layer cross-attention + split query/text FFN).
  * BEATs vs the reference implementation itself, imported read-only from
    ``/root/reference`` with a stubbed ``torchaudio`` (only used for fbank,
    which the repo's copy bypasses anyway — ``BEATs.py:142-143``).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from moka_tpu.models.beats import BeatsConfig, beats_encode
from moka_tpu.models.clip_vit import ClipVitConfig, clip_hidden_states
from moka_tpu.models.qformer import QFormerConfig, qformer_encode
from moka_tpu.train import import_torch as imp


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_clip_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModel
    hf_cfg = CLIPVisionConfig(hidden_size=64, intermediate_size=128,
                              num_hidden_layers=3, num_attention_heads=4,
                              image_size=28, patch_size=14)
    torch.manual_seed(0)
    model = CLIPVisionModel(hf_cfg).eval()
    cfg = ClipVitConfig(image_size=28, patch_size=14, hidden=64, n_layers=3,
                        n_heads=4, intermediate=128)
    params = imp.import_clip(_sd(model), cfg)

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(imgs), output_hidden_states=True)
    select = (0, 1, 3)
    got = clip_hidden_states(params, cfg, jnp.asarray(imgs), select)
    for l, g in zip(select, got):
        want = out.hidden_states[l][:, 1:].numpy()
        np.testing.assert_allclose(np.asarray(g), want, rtol=2e-4, atol=2e-4)


def _rename_instructblip_keys(sd):
    """InstructBlip naming -> reference BLIP-2 naming (the importer speaks
    the reference's ``attention.self.query`` / ``embeddings.LayerNorm``)."""
    out = {}
    for k, v in sd.items():
        k = k.replace("embeddings.layernorm", "embeddings.LayerNorm")
        k = k.replace("attention.attention.", "attention.self.")
        out[k] = v
    return out


def test_qformer_parity_query_and_text():
    from transformers import (InstructBlipQFormerConfig,
                              InstructBlipQFormerModel)
    hf_cfg = InstructBlipQFormerConfig(
        vocab_size=99, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96, encoder_hidden_size=40,
        cross_attention_frequency=1, max_position_embeddings=64)
    torch.manual_seed(0)
    model = InstructBlipQFormerModel(hf_cfg).eval()

    cfg = QFormerConfig(hidden=48, n_layers=2, n_heads=4, intermediate=96,
                        encoder_width=40, vocab_size=99, max_positions=64,
                        num_query_tokens=5)
    sd = _rename_instructblip_keys(_sd(model))
    params = imp.import_qformer(sd, cfg, prefix="")
    rng = np.random.default_rng(0)
    params["query_tokens"] = jnp.asarray(
        rng.standard_normal((5, 48)).astype(np.float32) * 0.02)

    enc = rng.standard_normal((2, 7, 40)).astype(np.float32)
    ids = rng.integers(1, 99, (2, 6)).astype(np.int64)
    attn = np.ones((2, 5 + 6), np.int64)
    attn[1, -2:] = 0  # padded text tokens in sample 1
    with torch.no_grad():
        want = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(attn),
            query_embeds=torch.from_numpy(
                np.asarray(params["query_tokens"])[None].repeat(2, 0)),
            encoder_hidden_states=torch.from_numpy(enc),
        ).last_hidden_state.numpy()[:, :5]

    got = qformer_encode(params, cfg, jnp.asarray(enc),
                         text_ids=jnp.asarray(ids),
                         text_mask=jnp.asarray(attn[:, 5:]))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_qformer_parity_query_only():
    from transformers import Blip2QFormerConfig, Blip2QFormerModel
    hf_cfg = Blip2QFormerConfig(
        vocab_size=99, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96, encoder_hidden_size=40,
        cross_attention_frequency=1, max_position_embeddings=64)
    torch.manual_seed(1)
    model = Blip2QFormerModel(hf_cfg).eval()
    sd = _rename_instructblip_keys(_sd(model))
    # Blip2QFormerModel has no word/pos embeddings in some versions; supply
    # dummies if missing (query-only path never touches them).
    for name, shape in (("embeddings.word_embeddings.weight", (99, 48)),
                        ("embeddings.position_embeddings.weight", (64, 48))):
        if name not in sd:
            sd[name] = np.zeros(shape, np.float32)
    if "embeddings.LayerNorm.weight" not in sd:
        sd["embeddings.LayerNorm.weight"] = sd["layernorm.weight"]
        sd["embeddings.LayerNorm.bias"] = sd["layernorm.bias"]
    # Blip2QFormer (query-only) has no text-slice FFN; alias the query FFN
    # (never exercised on this path).
    for i in range(2):
        for a, b in (("intermediate", "intermediate_query"),
                     ("output", "output_query")):
            for suf in (".dense.weight", ".dense.bias", ".LayerNorm.weight",
                        ".LayerNorm.bias"):
                key = f"encoder.layer.{i}.{a}{suf}"
                if key not in sd:
                    src = f"encoder.layer.{i}.{b}{suf}"
                    if src in sd:
                        sd[key] = sd[src]

    cfg = QFormerConfig(hidden=48, n_layers=2, n_heads=4, intermediate=96,
                        encoder_width=40, vocab_size=99, max_positions=64,
                        num_query_tokens=4)
    params = imp.import_qformer(sd, cfg, prefix="")
    rng = np.random.default_rng(2)
    params["query_tokens"] = jnp.asarray(
        rng.standard_normal((4, 48)).astype(np.float32) * 0.02)

    enc = rng.standard_normal((3, 6, 40)).astype(np.float32)
    with torch.no_grad():
        want = model(
            query_embeds=torch.from_numpy(
                np.asarray(params["query_tokens"])[None].repeat(3, 0)),
            encoder_hidden_states=torch.from_numpy(enc),
        ).last_hidden_state.numpy()[:, :4]
    got = qformer_encode(params, cfg, jnp.asarray(enc))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def reference_beats():
    """Import the reference BEATs (read-only) with torchaudio stubbed."""
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        comp = types.ModuleType("torchaudio.compliance")
        kaldi = types.ModuleType("torchaudio.compliance.kaldi")
        kaldi.fbank = None
        ta.compliance = comp
        comp.kaldi = kaldi
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.compliance"] = comp
        sys.modules["torchaudio.compliance.kaldi"] = kaldi
    sys.path.insert(0, "/root/reference/AudioVisualText/models")
    try:
        from beats.BEATs import BEATs, BEATsConfig as RefCfg
    finally:
        sys.path.pop(0)
    return BEATs, RefCfg


def test_beats_parity(reference_beats):
    BEATs, RefCfg = reference_beats
    ref_cfg = RefCfg({
        "input_patch_size": 16, "embed_dim": 24, "encoder_embed_dim": 48,
        "encoder_layers": 2, "encoder_ffn_embed_dim": 96,
        "encoder_attention_heads": 4, "deep_norm": True,
        "layer_norm_first": False, "relative_position_embedding": True,
        "num_buckets": 16, "max_distance": 64, "gru_rel_pos": True,
        "conv_pos": 16, "conv_pos_groups": 4, "encoder_layerdrop": 0.0,
        "dropout": 0.0, "attention_dropout": 0.0, "dropout_input": 0.0,
    })
    torch.manual_seed(0)
    model = BEATs(ref_cfg).eval()
    cfg = BeatsConfig(input_patch_size=16, embed_dim=24,
                      encoder_embed_dim=48, encoder_layers=2,
                      encoder_ffn_dim=96, encoder_heads=4, deep_norm=True,
                      relative_position_embedding=True, num_buckets=16,
                      max_distance=64, gru_rel_pos=True, conv_pos=16,
                      conv_pos_groups=4)
    params = imp.import_beats(_sd(model), cfg)

    rng = np.random.default_rng(0)
    fbank = rng.standard_normal((2, 96, 128)).astype(np.float32)
    with torch.no_grad():
        pad = torch.zeros(2, 96, dtype=torch.bool)
        want, _ = model.extract_features(torch.from_numpy(fbank),
                                         padding_mask=pad, feature_only=True)
    got = beats_encode(params, cfg, jnp.asarray(fbank))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=3e-4,
                               atol=3e-4)


def test_beats_parity_plain_config(reference_beats):
    """Config-flag coverage: no deep-norm, no relative bias, no gru gate
    (the flags are ckpt-driven, multimodal_encoder.py:178-182)."""
    BEATs, RefCfg = reference_beats
    ref_cfg = RefCfg({
        "input_patch_size": 16, "embed_dim": 24, "encoder_embed_dim": 48,
        "encoder_layers": 2, "encoder_ffn_embed_dim": 96,
        "encoder_attention_heads": 4, "deep_norm": False,
        "layer_norm_first": False, "relative_position_embedding": False,
        "gru_rel_pos": False, "conv_pos": 16, "conv_pos_groups": 4,
        "encoder_layerdrop": 0.0, "dropout": 0.0, "attention_dropout": 0.0,
        "dropout_input": 0.0,
    })
    torch.manual_seed(2)
    model = BEATs(ref_cfg).eval()
    cfg = BeatsConfig(input_patch_size=16, embed_dim=24,
                      encoder_embed_dim=48, encoder_layers=2,
                      encoder_ffn_dim=96, encoder_heads=4, deep_norm=False,
                      relative_position_embedding=False, gru_rel_pos=False,
                      conv_pos=16, conv_pos_groups=4)
    sd = _sd(model)
    # no relative bias table in this config; importer needs a placeholder
    sd.setdefault("encoder.layers.0.self_attn.relative_attention_bias.weight",
                  np.zeros((cfg.num_buckets, cfg.encoder_heads), np.float32))
    params = imp.import_beats(sd, cfg)
    rng = np.random.default_rng(5)
    fbank = rng.standard_normal((2, 64, 128)).astype(np.float32)
    with torch.no_grad():
        want, _ = model.extract_features(
            torch.from_numpy(fbank),
            padding_mask=torch.zeros(2, 64, dtype=torch.bool),
            feature_only=True)
    got = beats_encode(params, cfg, jnp.asarray(fbank))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=3e-4,
                               atol=3e-4)
