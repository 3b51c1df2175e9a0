"""Checkpointing: orbax for native save/resume + torch-format export for
reference interop.

Replaces the reference's three artifact families (SURVEY.md §5):
  (a) periodic adapter-only ``finetune_weights.bin``
      (``AudioVisualText/trainer.py:183-218``)  -> orbax step dirs holding
      the trainable pytree + optimizer state (resume included, which the
      reference's adapter-only periodic saves actually lose);
  (b) final split ``adapter_model.bin`` + ``non_lora_trainables.bin``
      (``finetune.py:195-201``)                 -> ``export_torch_artifacts``;
  (c) auto-resume from last checkpoint (``finetune.py:187-190``)
                                               -> ``latest_step``/``restore``.

No ZeRO-gathering machinery needed: the trainable tree is replicated, so a
rank-0 save is the whole story (``jax.process_index() == 0``).
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from moka_tpu.train.step import TrainState


def _mgr(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save(directory: str, state: TrainState, max_to_keep: int = 3) -> None:
    mgr = _mgr(directory, max_to_keep)
    mgr.save(int(state.step),
             args=ocp.args.StandardSave({
                 "step": np.asarray(state.step),
                 "params": jax.tree.map(np.asarray, state.params),
                 "opt_state": jax.tree.map(np.asarray, state.opt_state),
                 "rng": np.asarray(jax.random.key_data(state.rng)),
             }))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    mgr = _mgr(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore(directory: str, template: TrainState,
            step: int | None = None) -> TrainState:
    """Restore into the structure of ``template`` (shapes/dtypes/sharding)."""
    mgr = _mgr(directory)
    step = step if step is not None else mgr.latest_step()
    tpl = {
        "step": np.asarray(template.step),
        "params": jax.tree.map(np.asarray, template.params),
        "opt_state": jax.tree.map(np.asarray, template.opt_state),
        "rng": np.asarray(jax.random.key_data(template.rng)),
    }
    out = mgr.restore(step, args=ocp.args.StandardRestore(tpl))
    mgr.close()
    import jax.numpy as jnp
    return TrainState(step=jnp.asarray(out["step"]),
                      params=out["params"], opt_state=out["opt_state"],
                      rng=jax.random.wrap_key_data(jnp.asarray(out["rng"])))


# ------------------------------------------------------- torch export ----

def adapters_to_torch_state_dict(adapters: dict,
                                 prefix: str = "base_model.model.model."
                                 ) -> dict:
    """Layer-stacked adapter pytree -> peft_hyper-style names
    (``...layers.N.self_attn.q_proj.lora_A0.weight``), inverse of
    ``import_torch.import_moka_adapters_avt``."""
    group = {"q": "self_attn.q_proj", "k": "self_attn.k_proj",
             "v": "self_attn.v_proj", "o": "self_attn.o_proj",
             "gate": "mlp.gate_proj", "up": "mlp.up_proj",
             "down": "mlp.down_proj"}
    sd = {}
    for name, p in adapters["layers"].items():
        a = np.asarray(p["a"], np.float32)  # (N, M, d_in, r)
        b = np.asarray(p["b"], np.float32)  # (N, r, d_out)
        n_layers, n_mod = a.shape[:2]
        for layer in range(n_layers):
            base = f"{prefix}layers.{layer}.{group[name]}"
            for m in range(n_mod):
                sd[f"{base}.lora_A{m}.weight"] = a[layer, m].T.copy()
            sd[f"{base}.lora_B0.weight"] = b[layer].T.copy()
    return sd


def export_torch_artifacts(out_dir: str, trainable: dict,
                           stage1: bool = False) -> None:
    """Final split save matching ``finetune.py:195-201``:
    ``adapter_model.bin`` (lora params) + ``non_lora_trainables.bin``
    (projector params).

    Key prefixes are stage-dependent, mirroring the reference's
    ``named_parameters()`` naming at save time:

    * stage-2 (default): the model is peft-wrapped, so keys carry
      ``base_model.model.model.`` (``finetune.py:197``) — the prefix the
      reference inference driver's strict=False load actually matches
      (``inference_cut.py:176-178``).  Bare ``vl_projector.`` keys would
      silently match nothing there.
    * ``stage1=True``: no peft wrap, keys carry ``model.``
      (``pretrain.py:144-148``), and new-token embedding rows export as
      ``model.embed_tokens.weight`` (popped by the stage-2 loader,
      ``finetune.py:138-148``).
    """
    import torch
    os.makedirs(out_dir, exist_ok=True)
    if "adapters" in trainable:
        sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
              adapters_to_torch_state_dict(trainable["adapters"]).items()}
        torch.save(sd, os.path.join(out_dir, "adapter_model.bin"))
    non_lora = {}
    wrap = "model." if stage1 else "base_model.model.model."
    for proj_key, ref_prefix, kind in (
            ("vl_projector", f"{wrap}vl_projector.", "visual"),
            ("al_projector", f"{wrap}al_projector.", "audio"),
            ("projector", f"{wrap}multi_modal_projector.", "visual")):
        if proj_key in trainable:
            non_lora.update(projector_to_torch_state_dict(
                trainable[proj_key], kind=kind, prefix=ref_prefix))
    if stage1 and "new_token_embeds" in trainable:
        non_lora[f"{wrap}embed_tokens.weight"] = np.asarray(
            trainable["new_token_embeds"], np.float32)
    if non_lora:
        import torch
        non_lora = {k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in non_lora.items()}
        torch.save(non_lora, os.path.join(out_dir,
                                          "non_lora_trainables.bin"))


def projector_to_torch_state_dict(proj: dict, kind: str = "visual",
                                  prefix: str = "") -> dict:
    """Inverse of ``import_torch.import_projector`` (reference attribute
    naming: ``visual_ln/visual_Qformer/visual_query_tokens/visual_proj``)."""
    k = kind
    sd = {}

    def lin(p, name):
        sd[f"{prefix}{name}.weight"] = np.asarray(p["w"], np.float32).T.copy()
        sd[f"{prefix}{name}.bias"] = np.asarray(p["b"], np.float32)

    def lnp(p, name):
        sd[f"{prefix}{name}.weight"] = np.asarray(p["g"], np.float32)
        sd[f"{prefix}{name}.bias"] = np.asarray(p["b"], np.float32)

    lnp(proj["input_ln"], f"{k}_ln")
    sd[f"{prefix}{k}_query_tokens"] = np.asarray(
        proj["qformer"]["query_tokens"], np.float32)[None]
    lin(proj["mlp"]["fc1"], f"{k}_proj.0")
    lin(proj["mlp"]["fc2"], f"{k}_proj.2")

    q = proj["qformer"]
    qp = f"{k}_Qformer.bert."
    sd[f"{prefix}{qp}embeddings.word_embeddings.weight"] = np.asarray(
        q["word_embed"], np.float32)
    sd[f"{prefix}{qp}embeddings.position_embeddings.weight"] = np.asarray(
        q["pos_embed"], np.float32)
    sd[f"{prefix}{qp}embeddings.LayerNorm.weight"] = np.asarray(
        q["embed_ln"]["g"], np.float32)
    sd[f"{prefix}{qp}embeddings.LayerNorm.bias"] = np.asarray(
        q["embed_ln"]["b"], np.float32)
    name_map = {
        "attn_q": "attention.self.query", "attn_k": "attention.self.key",
        "attn_v": "attention.self.value",
        "attn_out": "attention.output.dense",
        "attn_ln": "attention.output.LayerNorm",
        "cross_q": "crossattention.self.query",
        "cross_k": "crossattention.self.key",
        "cross_v": "crossattention.self.value",
        "cross_out": "crossattention.output.dense",
        "cross_ln": "crossattention.output.LayerNorm",
        "ffn_q_in": "intermediate_query.dense",
        "ffn_q_out": "output_query.dense",
        "ffn_q_ln": "output_query.LayerNorm",
        "ffn_t_in": "intermediate.dense", "ffn_t_out": "output.dense",
        "ffn_t_ln": "output.LayerNorm",
    }
    n_layers = np.asarray(q["layers"]["attn_q"]["w"]).shape[0]
    for i in range(n_layers):
        for ours, theirs in name_map.items():
            p = q["layers"][ours]
            full = f"{prefix}{qp}encoder.layer.{i}.{theirs}"
            if "ln" in ours.split("_")[-1]:
                sd[f"{full}.weight"] = np.asarray(p["g"][i], np.float32)
                sd[f"{full}.bias"] = np.asarray(p["b"][i], np.float32)
            else:
                sd[f"{full}.weight"] = np.asarray(p["w"][i],
                                                  np.float32).T.copy()
                sd[f"{full}.bias"] = np.asarray(p["b"][i], np.float32)
    return sd


def export_vt_state_dict(trainable: dict, cfg) -> dict:
    """VT trainable -> reference submodule naming
    (``multi_modal_projector.*`` + ``...q_proj.lora_A.{text,image}.weight`` /
    ``lora_B.text.weight``).

    NOTE: this is the TRAINABLE subset only.  The reference eval drivers
    load ``model.safetensors`` with ``strict=True`` onto a PeftMixedModel
    (``mmbench.py:576-577``), which requires the FULL state dict (frozen
    vision tower + llama base + lm_head) under ``base_model.model.``
    wrapper prefixes — use ``export_vt_full_state_dict`` for that.  This
    artifact round-trips via ``import_torch.import_vt_trainable`` (substring
    key matching), which is the in-framework interop path."""
    sd = {}
    if "projector" in trainable:
        sd.update(projector_to_torch_state_dict(
            trainable["projector"], kind="visual",
            prefix="multi_modal_projector."))
    group = {"q": "self_attn.q_proj", "k": "self_attn.k_proj",
             "v": "self_attn.v_proj", "o": "self_attn.o_proj",
             "gate": "mlp.gate_proj", "up": "mlp.up_proj",
             "down": "mlp.down_proj"}
    names = ("text", "image")
    if "adapters" in trainable:
        for name, p in trainable["adapters"]["layers"].items():
            a = np.asarray(p["a"], np.float32)
            b = np.asarray(p["b"], np.float32)
            for layer in range(a.shape[0]):
                base = (f"language_model.model.layers.{layer}."
                        f"{group[name]}")
                for m, adapter in enumerate(names):
                    sd[f"{base}.lora_A.{adapter}.weight"] = \
                        a[layer, m].T.copy()
                sd[f"{base}.lora_B.text.weight"] = b[layer].T.copy()
    return sd


def save_vt_safetensors(path: str, trainable: dict, cfg) -> None:
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v) for k, v in
               export_vt_state_dict(trainable, cfg).items()}, path)


def clip_to_torch_state_dict(clip: dict, cfg,
                             prefix: str = "vision_model.") -> dict:
    """Inverse of ``import_torch.import_clip`` (HF CLIPVisionModel naming,
    incl. the upstream 'pre_layrnorm' typo)."""
    sd = {}
    patch = np.asarray(clip["patch"], np.float32)       # (3*p*p, d)
    d = patch.shape[1]
    p = cfg.patch_size
    sd[f"{prefix}embeddings.patch_embedding.weight"] = \
        np.ascontiguousarray(patch.T.reshape(d, 3, p, p))
    sd[f"{prefix}embeddings.class_embedding"] = np.asarray(
        clip["cls"], np.float32)
    sd[f"{prefix}embeddings.position_embedding.weight"] = np.asarray(
        clip["pos"], np.float32)

    def lnp(tree, name):
        sd[f"{name}.weight"] = np.asarray(tree["g"], np.float32)
        sd[f"{name}.bias"] = np.asarray(tree["b"], np.float32)

    lnp(clip["pre_ln"], f"{prefix}pre_layrnorm")
    lnp(clip["post_ln"], f"{prefix}post_layernorm")
    names = {"ln1": "layer_norm1", "q": "self_attn.q_proj",
             "k": "self_attn.k_proj", "v": "self_attn.v_proj",
             "out": "self_attn.out_proj", "ln2": "layer_norm2",
             "fc1": "mlp.fc1", "fc2": "mlp.fc2"}
    n_layers = np.asarray(clip["layers"]["q"]["w"]).shape[0]
    for i in range(n_layers):
        for ours, theirs in names.items():
            t = clip["layers"][ours]
            full = f"{prefix}encoder.layers.{i}.{theirs}"
            if ours.startswith("ln"):
                sd[f"{full}.weight"] = np.asarray(t["g"][i], np.float32)
            else:
                sd[f"{full}.weight"] = np.ascontiguousarray(
                    np.asarray(t["w"][i], np.float32).T)
            sd[f"{full}.bias"] = np.asarray(t["b"][i], np.float32)
    return sd


def export_vt_full_state_dict(trainable: dict, frozen: dict, cfg) -> dict:
    """The FULL PeftMixedModel state dict the reference eval drivers load
    with ``strict=True`` (``mmbench.py:576-577``): frozen CLIP vision tower
    + frozen llama base (projection weights under ``.base_layer``) + lm_head
    + Q-Former projector + both dual adapters, all under ``base_model.model.``
    wrapper prefixes.  Key inventory is pinned against the reference model's
    own ``state_dict()`` in ``tests/test_vt_full_export.py``.

    Two families of keys exist in the reference module tree but not in this
    framework's math (both provably unused in its forward):
    ``visual_Qformer.cls.*`` (the BertLMHeadModel LM head — the projector
    uses ``feature_only`` query outputs) exports as zeros, and
    ``bert.embeddings.position_ids`` (a persistent arange buffer) is
    materialized directly."""
    from moka_tpu.ops.quant import dequantize, is_quantized

    root = "base_model.model."
    inner = f"{root}model."
    sd = {}

    # --- frozen CLIP tower ---
    sd.update(clip_to_torch_state_dict(
        frozen["clip"], cfg.clip,
        prefix=f"{inner}vision_tower.vision_model."))

    # --- frozen llama base (+ lm_head at the wrapper root) ---
    base = frozen["llama"]
    lm = f"{inner}language_model."
    sd[f"{lm}embed_tokens.weight"] = np.asarray(base["embed"], np.float32)
    sd[f"{lm}norm.weight"] = np.asarray(base["final_norm"], np.float32)
    lm_w = base["lm_head"]
    if is_quantized(lm_w):  # head-quantized training tree: export dequant
        lm_w = dequantize(lm_w, dtype="float32")
    sd[f"{root}lm_head.weight"] = np.ascontiguousarray(
        np.asarray(lm_w, np.float32).T)
    group = {"q": "self_attn.q_proj", "k": "self_attn.k_proj",
             "v": "self_attn.v_proj", "o": "self_attn.o_proj",
             "gate": "mlp.gate_proj", "up": "mlp.up_proj",
             "down": "mlp.down_proj"}
    n_layers = cfg.llama.n_layers
    for name, theirs in group.items():
        w = base["layers"][name]
        if is_quantized(w):
            w = dequantize(w, dtype=np.float32)
        w = np.asarray(w, np.float32)  # (N, d_in, d_out)
        for i in range(n_layers):
            sd[f"{lm}layers.{i}.{theirs}.base_layer.weight"] = \
                np.ascontiguousarray(w[i].T)
    for i in range(n_layers):
        sd[f"{lm}layers.{i}.input_layernorm.weight"] = np.asarray(
            base["layers"]["attn_norm"][i], np.float32)
        sd[f"{lm}layers.{i}.post_attention_layernorm.weight"] = np.asarray(
            base["layers"]["mlp_norm"][i], np.float32)

    # --- dual adapters (lora_B.image exists in the module tree but is
    # never applied — layer.py:657; zero-init like the reference) ---
    for name, p in trainable["adapters"]["layers"].items():
        a = np.asarray(p["a"], np.float32)   # (N, 2, d_in, r)
        b = np.asarray(p["b"], np.float32)   # (N, r, d_out)
        for i in range(n_layers):
            basek = f"{lm}layers.{i}.{group[name]}"
            sd[f"{basek}.lora_A.text.weight"] = np.ascontiguousarray(
                a[i, 0].T)
            sd[f"{basek}.lora_A.image.weight"] = np.ascontiguousarray(
                a[i, 1].T)
            sd[f"{basek}.lora_B.text.weight"] = np.ascontiguousarray(b[i].T)
            sd[f"{basek}.lora_B.image.weight"] = np.zeros_like(b[i].T)

    # --- Q-Former projector + vendored-BertLMHeadModel extras ---
    proj_prefix = f"{inner}multi_modal_projector."
    sd.update(projector_to_torch_state_dict(
        trainable["projector"], kind="visual", prefix=proj_prefix))
    q = trainable["projector"]["qformer"]
    vocab, hidden = np.asarray(q["word_embed"]).shape
    max_pos = np.asarray(q["pos_embed"]).shape[0]
    qp = f"{proj_prefix}visual_Qformer."
    sd[f"{qp}bert.embeddings.position_ids"] = np.arange(
        max_pos, dtype=np.int64)[None]
    cls = f"{qp}cls.predictions."
    sd[f"{cls}bias"] = np.zeros((vocab,), np.float32)
    sd[f"{cls}decoder.weight"] = np.zeros((vocab, hidden), np.float32)
    sd[f"{cls}decoder.bias"] = np.zeros((vocab,), np.float32)
    sd[f"{cls}transform.dense.weight"] = np.zeros((hidden, hidden),
                                                  np.float32)
    sd[f"{cls}transform.dense.bias"] = np.zeros((hidden,), np.float32)
    sd[f"{cls}transform.LayerNorm.weight"] = np.ones((hidden,), np.float32)
    sd[f"{cls}transform.LayerNorm.bias"] = np.zeros((hidden,), np.float32)
    return sd


def save_vt_full_safetensors(path: str, trainable: dict, frozen: dict,
                             cfg) -> None:
    """``model.safetensors`` loadable by the reference eval drivers
    (strict=True onto a PeftMixedModel)."""
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v) for k, v in
               export_vt_full_state_dict(trainable, frozen, cfg).items()},
              path)
