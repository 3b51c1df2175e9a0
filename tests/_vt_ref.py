"""Test helper: build the reference VT model (PeftMixedModel over
``modified_models/modelling_llava.py``) at tiny config, entirely from local
fabricated assets.  Used by the full-state-dict export parity tests — the
reference eval drivers load ``model.safetensors`` with ``strict=True``
(``mmbench.py:576-577``), so the only trustworthy key inventory is the
reference model's own ``state_dict()``.

The vendored tree targets transformers 4.53 / peft 0.11; the image ships
newer versions, so a handful of moved/removed helper names are aliased
before import (none are exercised by the plain-Linear/BERT paths the tests
touch).
"""

import json
import os
import sys

REF_VT = "/root/reference/VisualText"


def _stub_api_drift():
    import importlib.machinery
    import types
    if "torchaudio" not in sys.modules:
        # only used for fbank by the (unreached) BEATs import chain; give the
        # stubs real ModuleSpecs so importlib.util.find_spec stays happy
        mods = {}
        for name in ("torchaudio", "torchaudio.compliance",
                     "torchaudio.compliance.kaldi"):
            m = types.ModuleType(name)
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
            m.__path__ = []
            mods[name] = m
            sys.modules[name] = m
        mods["torchaudio.compliance.kaldi"].fbank = None
        mods["torchaudio"].compliance = mods["torchaudio.compliance"]
        mods["torchaudio.compliance"].kaldi = \
            mods["torchaudio.compliance.kaldi"]

    import transformers.modeling_utils as tmu
    import transformers.utils as tu
    from transformers import pytorch_utils as pu

    if not hasattr(tu, "LossKwargs"):
        from typing import TypedDict

        class LossKwargs(TypedDict, total=False):
            ...
        tu.LossKwargs = LossKwargs
    for name in ("auto_docstring", "can_return_tuple"):
        if not hasattr(tu, name):
            setattr(tu, name,
                    lambda f=None, **k: (f if f is not None
                                         else (lambda g: g)))
    if not hasattr(tu, "is_torchdynamo_compiling"):
        tu.is_torchdynamo_compiling = lambda: False
    for name in ("apply_chunking_to_forward",
                 "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(tmu, name):
            setattr(tmu, name, getattr(pu, name))

    from transformers import CLIPVisionModel
    if not hasattr(CLIPVisionModel, "from_config"):
        # the reference's no-checkpoint branch (modelling_llava.py:167)
        CLIPVisionModel.from_config = classmethod(lambda cls, cfg: cls(cfg))

    import peft.import_utils
    import peft.utils
    for mod in (peft.utils, peft.import_utils):
        # get_auto_gptq_quant_linear must return None (used in an
        # isinstance check); the is_*_available probes return False
        if not hasattr(mod, "get_auto_gptq_quant_linear"):
            mod.get_auto_gptq_quant_linear = lambda *a, **k: None
        for name in ("is_auto_awq_available", "is_auto_gptq_available",
                     "is_eetq_available", "is_hqq_available",
                     "is_aqlm_available"):
            if not hasattr(mod, name):
                setattr(mod, name, lambda *a, **k: False)


def _tiny_bert_dir(tmp: str, hidden: int = 32) -> str:
    bert_dir = os.path.join(tmp, "tiny_bert")
    os.makedirs(bert_dir, exist_ok=True)
    # vocab/max_positions match the real google-bert defaults (and this
    # framework's QFormerConfig), so state-dict shapes line up exactly
    json.dump({"architectures": ["BertModel"], "hidden_size": hidden,
               "num_attention_heads": 4, "num_hidden_layers": 2,
               "intermediate_size": 2 * hidden, "vocab_size": 30522,
               "max_position_embeddings": 512, "model_type": "bert"},
              open(f"{bert_dir}/config.json", "w"))
    with open(f"{bert_dir}/vocab.txt", "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] +
                          [f"tok{i}" for i in range(25)]))
    return bert_dir


def build_reference_vt(tmp: str, *, dim: int = 32, n_layers: int = 2,
                       n_heads: int = 4, vocab: int = 64,
                       clip_hidden: int = 32, clip_layers: int = 2,
                       image_size: int = 28, patch: int = 14,
                       num_query_token: int = 3, attn_weight: float = 0.05,
                       wrap_peft: bool = True):
    """Returns (model, configs_dict).  model is PeftMixedModel when
    wrap_peft (dual 'image'/'text' adapters on all 7 projections, the
    ``train.py:548-561`` recipe) else the bare LlavaForConditionalGeneration."""
    if not os.path.isdir(REF_VT):
        import pytest
        pytest.skip("reference tree not available")
    _stub_api_drift()
    if REF_VT not in sys.path:
        sys.path.insert(0, REF_VT)

    from transformers import CLIPVisionConfig, LlamaConfig, LlavaConfig
    from modified_models.modelling_llava import LlavaForConditionalGeneration

    vis = CLIPVisionConfig(hidden_size=clip_hidden,
                           intermediate_size=2 * clip_hidden,
                           num_hidden_layers=clip_layers,
                           num_attention_heads=4, image_size=image_size,
                           patch_size=patch)
    txt = LlamaConfig(hidden_size=dim, intermediate_size=2 * dim,
                      num_hidden_layers=n_layers,
                      num_attention_heads=n_heads,
                      num_key_value_heads=n_heads, vocab_size=vocab)
    cfg = LlavaConfig(vision_config=vis, text_config=txt,
                      image_token_index=0)
    n_patches = (image_size // patch) ** 2
    proj_cfg = {"hidden_size": clip_hidden, "d_model": dim, "depth": 2,
                "image_token_nums": n_patches,
                "num_query_token": num_query_token,
                "num_hidden_layers": 2,
                "bert_ckpt_path": _tiny_bert_dir(tmp, hidden=clip_hidden)}
    model = LlavaForConditionalGeneration(cfg, proj_cfg, llama2_path=None,
                                          vit_path=None)
    if not wrap_peft:
        return model, {"llava": cfg, "proj": proj_cfg}

    from modified_peft import LoraConfig
    from modified_peft.mixed_model import PeftMixedModel

    target_modules = []
    projs = "q_proj,k_proj,v_proj,o_proj,gate_proj,down_proj,up_proj".split(",")
    for name, _ in model.named_modules():
        if "language_model" in name and any(p in name for p in projs):
            target_modules.append(name)
    lora_config = LoraConfig(inference_mode=False, r=4,
                             target_modules=target_modules, lora_alpha=16,
                             lora_dropout=0.05, task_type="CAUSAL_LM",
                             attn_weight=attn_weight)
    peft_model = PeftMixedModel(model, lora_config, adapter_name="image")
    peft_model.add_adapter("text", lora_config)
    peft_model.set_adapter(["image", "text"])
    return peft_model, {"llava": cfg, "proj": proj_cfg}
