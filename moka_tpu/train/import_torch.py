"""Torch-checkpoint importers: reference artifacts -> moka_tpu pytrees.

Handles every artifact family the reference produces or consumes
(SURVEY.md §5 checkpoint row):
  * HF LLaMA base weights               -> llama params (layer-stacked)
  * HF CLIPVisionModel                  -> clip_vit params
  * BEATs ``.pt`` (cfg + model)         -> beats params (weight-norm folded)
  * Q-Former/projector state dicts      -> projector params
  * ``adapter_model.bin`` (peft MokA)   -> adapter params
  * ``non_lora_trainables.bin`` / ``visual_pretrain.bin`` -> projector (+embed)

All functions operate on ``{name: np.ndarray}`` dicts; ``load_torch`` reads
``.bin``/``.pt``/``.safetensors`` on CPU.  Torch linear weights are (out, in)
and are transposed into our (in, out) layout.
"""

from __future__ import annotations

import re

import numpy as np
import jax.numpy as jnp

from moka_tpu.core.config import LlamaConfig
from moka_tpu.models.beats import BeatsConfig
from moka_tpu.models.clip_vit import ClipVitConfig
from moka_tpu.models.qformer import QFormerConfig


def load_torch(path: str) -> dict:
    """Load a torch/safetensors checkpoint to numpy on CPU.

    Accepts a single file or a directory of sharded checkpoints
    (``model-0000x-of-0000y.safetensors`` / ``pytorch_model*.bin``), merging
    the shards — real LLaMA releases ship sharded."""
    import os
    if os.path.isdir(path):
        names = sorted(os.listdir(path))
        shards = [n for n in names if n.endswith(".safetensors")
                  and not n.endswith(".index.json")]
        if not shards:
            shards = [n for n in names
                      if n.startswith("pytorch_model") and n.endswith(".bin")]
        if not shards:
            raise FileNotFoundError(f"no checkpoint shards under {path}")
        merged: dict = {}
        for n in shards:
            merged.update(load_torch(os.path.join(path, n)))
        return merged
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        # BEATs-style {cfg, model}
        return {k: v.numpy() if hasattr(v, "numpy") else v
                for k, v in obj["model"].items()}, obj.get("cfg")
    return {k: v.float().numpy() if hasattr(v, "numpy") else v
            for k, v in obj.items()}


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, dtype=np.float32).T)


def _lin(sd, prefix) -> dict:
    out = {"w": _t(sd[prefix + ".weight"])}
    out["b"] = np.asarray(sd.get(prefix + ".bias"),
                          np.float32) if prefix + ".bias" in sd else \
        np.zeros(out["w"].shape[1], np.float32)
    return out


def _lnp(sd, prefix) -> dict:
    return {"g": np.asarray(sd[prefix + ".weight"], np.float32),
            "b": np.asarray(sd[prefix + ".bias"], np.float32)}


def _stack(items: list[dict]) -> dict:
    import jax
    return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *items)


# ---------------------------------------------------------------- LLaMA ----

def import_llama(sd: dict, cfg: LlamaConfig, dtype=jnp.bfloat16) -> dict:
    """HF LlamaForCausalLM state dict -> layer-stacked params."""
    def g(name):
        return np.asarray(sd[name], np.float32)

    layers = {k: [] for k in
              ("q", "k", "v", "o", "gate", "up", "down", "attn_norm",
               "mlp_norm")}
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        layers["q"].append(_t(g(p + "self_attn.q_proj.weight")))
        layers["k"].append(_t(g(p + "self_attn.k_proj.weight")))
        layers["v"].append(_t(g(p + "self_attn.v_proj.weight")))
        layers["o"].append(_t(g(p + "self_attn.o_proj.weight")))
        layers["gate"].append(_t(g(p + "mlp.gate_proj.weight")))
        layers["up"].append(_t(g(p + "mlp.up_proj.weight")))
        layers["down"].append(_t(g(p + "mlp.down_proj.weight")))
        layers["attn_norm"].append(g(p + "input_layernorm.weight"))
        layers["mlp_norm"].append(g(p + "post_attention_layernorm.weight"))
    stacked = {k: jnp.asarray(np.stack(v), dtype) for k, v in layers.items()}
    lm_head = sd.get("lm_head.weight", sd["model.embed_tokens.weight"])
    return {
        "embed": jnp.asarray(g("model.embed_tokens.weight"), dtype),
        "layers": stacked,
        "final_norm": jnp.asarray(g("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(_t(np.asarray(lm_head, np.float32)), dtype),
    }


# ----------------------------------------------------------------- CLIP ----

def import_clip(sd: dict, cfg: ClipVitConfig, dtype=jnp.float32) -> dict:
    pre = "vision_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    patch_w = np.asarray(sd[pre + "embeddings.patch_embedding.weight"],
                         np.float32)  # (d, 3, p, p)
    d = patch_w.shape[0]
    patch = patch_w.reshape(d, -1).T  # (3*p*p, d), c-major like our patchify

    layers = []
    for i in range(cfg.n_layers):
        p = f"{pre}encoder.layers.{i}."
        layers.append({
            "ln1": _lnp(sd, p + "layer_norm1"),
            "q": _lin(sd, p + "self_attn.q_proj"),
            "k": _lin(sd, p + "self_attn.k_proj"),
            "v": _lin(sd, p + "self_attn.v_proj"),
            "out": _lin(sd, p + "self_attn.out_proj"),
            "ln2": _lnp(sd, p + "layer_norm2"),
            "fc1": _lin(sd, p + "mlp.fc1"),
            "fc2": _lin(sd, p + "mlp.fc2"),
        })
    return {
        "cls": jnp.asarray(sd[pre + "embeddings.class_embedding"], dtype),
        "patch": jnp.asarray(patch, dtype),
        "pos": jnp.asarray(sd[pre + "embeddings.position_embedding.weight"],
                           dtype),
        "pre_ln": _lnp(sd, pre + "pre_layrnorm"),
        "post_ln": _lnp(sd, pre + "post_layernorm"),
        "layers": _stack(layers),
    }


# ---------------------------------------------------------------- BEATs ----

def fold_weight_norm(g: np.ndarray, v: np.ndarray, dim: int = 2) -> np.ndarray:
    """torch ``weight_norm(conv, dim=2)``: per-kernel-position norm over the
    remaining dims (``backbone.py:45``)."""
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
    return g * v / norm


def import_beats(sd: dict, cfg: BeatsConfig, dtype=jnp.float32) -> dict:
    patch_w = np.asarray(sd["patch_embedding.weight"], np.float32)  # (e,1,p,p)
    e = patch_w.shape[0]
    patch = patch_w.reshape(e, -1).T  # (p*p, e)

    pos_g = np.asarray(sd["encoder.pos_conv.0.weight_g"], np.float32)
    pos_v = np.asarray(sd["encoder.pos_conv.0.weight_v"], np.float32)
    pos_w = fold_weight_norm(pos_g, pos_v, dim=2)

    layers = []
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}."
        grep_a = np.asarray(sd[p + "self_attn.grep_a"],
                            np.float32).reshape(-1) if \
            p + "self_attn.grep_a" in sd else np.ones(cfg.encoder_heads,
                                                      np.float32)
        layers.append({
            "q": _lin(sd, p + "self_attn.q_proj"),
            "k": _lin(sd, p + "self_attn.k_proj"),
            "v": _lin(sd, p + "self_attn.v_proj"),
            "out": _lin(sd, p + "self_attn.out_proj"),
            "ln_attn": _lnp(sd, p + "self_attn_layer_norm"),
            "fc1": _lin(sd, p + "fc1"),
            "fc2": _lin(sd, p + "fc2"),
            "ln_final": _lnp(sd, p + "final_layer_norm"),
            "grep": _lin(sd, p + "self_attn.grep_linear") if
                    p + "self_attn.grep_linear.weight" in sd else
                    {"w": np.zeros((cfg.head_dim, 8), np.float32),
                     "b": np.zeros((8,), np.float32)},
            "grep_a": grep_a,
        })
    out = {
        "patch": jnp.asarray(patch, dtype),
        "patch_bias": jnp.asarray(sd["patch_embedding.bias"], dtype)
                      if "patch_embedding.bias" in sd else None,
        "frontend_ln": _lnp(sd, "layer_norm"),
        "post_proj": _lin(sd, "post_extract_proj"),
        "pos_conv_w": jnp.asarray(pos_w, dtype),
        "pos_conv_b": jnp.asarray(sd["encoder.pos_conv.0.bias"], dtype),
        "encoder_ln": _lnp(sd, "encoder.layer_norm"),
        # shared table lives on layer 0 (backbone.py:78-81)
        "rel_bias": jnp.asarray(
            sd["encoder.layers.0.self_attn.relative_attention_bias.weight"],
            dtype),
        "layers": _stack(layers),
    }
    return out


def beats_config_from_ckpt(cfg_dict: dict) -> BeatsConfig:
    """Reference restores arch flags from the ckpt cfg
    (``multimodal_encoder.py:178-182``)."""
    return BeatsConfig(
        input_patch_size=cfg_dict.get("input_patch_size", 16),
        embed_dim=cfg_dict.get("embed_dim", 512),
        encoder_embed_dim=cfg_dict.get("encoder_embed_dim", 768),
        encoder_layers=cfg_dict.get("encoder_layers", 12),
        encoder_ffn_dim=cfg_dict.get("encoder_ffn_embed_dim", 3072),
        encoder_heads=cfg_dict.get("encoder_attention_heads", 12),
        conv_bias=cfg_dict.get("conv_bias", False),
        deep_norm=cfg_dict.get("deep_norm", False),
        layer_norm_first=cfg_dict.get("layer_norm_first", False),
        relative_position_embedding=cfg_dict.get("relative_position_embedding",
                                                 False),
        num_buckets=cfg_dict.get("num_buckets", 320),
        max_distance=cfg_dict.get("max_distance", 1280),
        gru_rel_pos=cfg_dict.get("gru_rel_pos", False),
        conv_pos=cfg_dict.get("conv_pos", 128),
        conv_pos_groups=cfg_dict.get("conv_pos_groups", 16),
    )


# -------------------------------------------------------------- QFormer ----

def import_qformer(sd: dict, cfg: QFormerConfig, prefix: str = "bert.") -> dict:
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}encoder.layer.{i}."
        layers.append({
            "attn_q": _lin(sd, p + "attention.self.query"),
            "attn_k": _lin(sd, p + "attention.self.key"),
            "attn_v": _lin(sd, p + "attention.self.value"),
            "attn_out": _lin(sd, p + "attention.output.dense"),
            "attn_ln": _lnp(sd, p + "attention.output.LayerNorm"),
            "cross_q": _lin(sd, p + "crossattention.self.query"),
            "cross_k": _lin(sd, p + "crossattention.self.key"),
            "cross_v": _lin(sd, p + "crossattention.self.value"),
            "cross_out": _lin(sd, p + "crossattention.output.dense"),
            "cross_ln": _lnp(sd, p + "crossattention.output.LayerNorm"),
            "ffn_q_in": _lin(sd, p + "intermediate_query.dense"),
            "ffn_q_out": _lin(sd, p + "output_query.dense"),
            "ffn_q_ln": _lnp(sd, p + "output_query.LayerNorm"),
            "ffn_t_in": _lin(sd, p + "intermediate.dense"),
            "ffn_t_out": _lin(sd, p + "output.dense"),
            "ffn_t_ln": _lnp(sd, p + "output.LayerNorm"),
        })
    return {
        "word_embed": jnp.asarray(
            sd[prefix + "embeddings.word_embeddings.weight"]),
        "pos_embed": jnp.asarray(
            sd[prefix + "embeddings.position_embeddings.weight"]),
        "embed_ln": _lnp(sd, prefix + "embeddings.LayerNorm"),
        "query_tokens": None,  # supplied by the projector importer
        "layers": _stack(layers),
    }


def import_projector(sd: dict, cfg, kind: str = "visual") -> dict:
    """Projector state dict (VLProjector/ALProjector module) -> params.

    kind selects the reference attribute names: visual_{ln,Qformer,
    query_tokens,proj} vs audio_* (``multimodal_encoder.py:98-113,217-233``)."""
    k = kind
    sub = {key[len(f"{k}_Qformer."):]: v for key, v in sd.items()
           if key.startswith(f"{k}_Qformer.")}
    q = import_qformer(sub, cfg.qformer())
    q["query_tokens"] = jnp.asarray(
        np.asarray(sd[f"{k}_query_tokens"], np.float32).reshape(
            cfg.num_query_tokens, -1))
    return {
        "input_ln": _lnp(sd, f"{k}_ln"),
        "qformer": q,
        "mlp": {"fc1": _lin(sd, f"{k}_proj.0"),
                "fc2": _lin(sd, f"{k}_proj.2")},
    }


# ------------------------------------------------------------- Adapters ----

_AVT_KEY = re.compile(
    r".*layers\.(\d+)\.(self_attn|mlp)\.(\w+)_proj\.lora_([AB])(\d+)\.weight")


def import_moka_adapters_avt(sd: dict, cfg: LlamaConfig, num_modalities: int,
                             rank: int,
                             targets=("q", "k", "v", "o", "gate", "up",
                                      "down")) -> dict:
    """``adapter_model.bin`` (peft_hyper naming ``...q_proj.lora_A0.weight``)
    -> layer-stacked adapter pytree."""
    shapes = {}
    from moka_tpu.models.llama import _proj_shapes
    shapes = _proj_shapes(cfg)
    out = {name: {"a": np.zeros((cfg.n_layers, num_modalities,
                                 shapes[name][0], rank), np.float32),
                  "b": np.zeros((cfg.n_layers, rank, shapes[name][1]),
                                np.float32)}
           for name in targets}
    for key, w in sd.items():
        m = _AVT_KEY.match(key)
        if not m:
            continue
        layer, _, proj, ab, idx = m.groups()
        layer, idx = int(layer), int(idx)
        if proj not in out:
            continue
        w = np.asarray(w, np.float32)
        if ab == "A":
            out[proj]["a"][layer, idx] = w.T  # (r, d_in) -> (d_in, r)
        else:
            out[proj]["b"][layer] = w.T      # (d_out, r) -> (r, d_out)
    return {"layers": {k: {"a": jnp.asarray(v["a"]),
                           "b": jnp.asarray(v["b"])} for k, v in out.items()}}


_VT_LORA_KEY = re.compile(
    r".*layers\.(\d+)\.(?:self_attn|mlp)\.(\w+)_proj\.lora_([AB])\.(\w+)\.weight")


def import_moka_adapters_vt(sd: dict, cfg: LlamaConfig, rank: int,
                            adapters: tuple[str, ...] = ("text", "image"),
                            targets=("q", "k", "v", "o", "gate", "up",
                                     "down")) -> dict:
    """VT PeftMixedModel naming (``...q_proj.lora_A.image.weight``,
    shared ``lora_B.text.weight``) -> layer-stacked adapter pytree.
    Modality order matches MokaSpec.vt: index 0 = text, 1 = image."""
    from moka_tpu.models.llama import _proj_shapes
    shapes = _proj_shapes(cfg)
    order = {name: i for i, name in enumerate(adapters)}
    out = {name: {"a": np.zeros((cfg.n_layers, len(adapters),
                                 shapes[name][0], rank), np.float32),
                  "b": np.zeros((cfg.n_layers, rank, shapes[name][1]),
                                np.float32)}
           for name in targets}
    for key, w in sd.items():
        m = _VT_LORA_KEY.match(key)
        if not m:
            continue
        layer, proj, ab, adapter = m.groups()
        layer = int(layer)
        if proj not in out or adapter not in order:
            continue
        w = np.asarray(w, np.float32)
        if ab == "A":
            out[proj]["a"][layer, order[adapter]] = w.T
        elif adapter == "text":  # only lora_B.text is applied (layer.py:657)
            out[proj]["b"][layer] = w.T
    return {"layers": {k: {"a": jnp.asarray(v["a"]),
                           "b": jnp.asarray(v["b"])} for k, v in out.items()}}


def strip_to_submodule(sd: dict, sub: str) -> dict:
    """Select keys containing ``sub`` and strip everything up to and
    including it.  Reference artifacts carry stage-dependent wrapper
    prefixes ('base_model.model.model.' from the peft-wrapped finetune
    save, 'model.' from stage-1 pretrain — ``finetune.py:197``,
    ``pretrain.py:144-148``) and load with ``strict=False``; substring
    matching is the only prefix-robust inverse."""
    out = {}
    for k, v in sd.items():
        i = k.find(sub)
        if i != -1:
            out[k[i + len(sub):]] = v
    return out


def import_vt_trainable(sd: dict, cfg, trainable: dict) -> dict:
    """VT full-state ``model.safetensors`` / ``visual_pretrain.bin`` ->
    {projector, adapters}.  The projector is the reference VLProjector
    mounted as ``multi_modal_projector`` (``modelling_llava.py:183``), so its
    keys keep the visual_* attribute names under that prefix."""
    proj_sd = {}
    for k, v in sd.items():
        idx = k.find("multi_modal_projector.")
        if idx >= 0:
            proj_sd[k[idx + len("multi_modal_projector."):]] = v
    if proj_sd:
        trainable = dict(trainable)
        trainable["projector"] = import_projector(
            proj_sd, cfg.projector, kind="visual")
    if any(".lora_A." in k for k in sd):
        trainable = dict(trainable)
        trainable["adapters"] = import_moka_adapters_vt(
            sd, cfg.llama, cfg.spec.rank)
    return trainable
