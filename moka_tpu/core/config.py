"""Config system: one dataclass tree replaces the reference's
HfArgumentParser dataclasses + 13 DeepSpeed JSONs + bash env zoo
(reference ``AudioVisualText/configs/unified_config.py``,
``VisualText/train/train.py:348-359``, ``deepspeed/*.json``).

Everything is a frozen dataclass so configs hash/compare cleanly and can be
closed over by jitted functions as static state.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any


def _asdict(obj) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _asdict(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_asdict(o) for o in obj]
    return obj


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Decoder config (reference llama forks:
    ``AudioVisualText/models/modeling_llama.py``,
    ``VisualText/modified_models/modeling_llama.py``)."""

    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    intermediate: int = 11008
    rope_theta: float = 10000.0
    # RoPE scaling: None | ("linear", factor) | ("dynamic", factor)
    # (reference modeling_llama.py:128-178 Linear/DynamicNTK scaling classes)
    rope_scaling: tuple[str, float] | None = None
    rms_eps: float = 1e-5
    max_seq_len: int = 2048
    tie_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @staticmethod
    def llama2_7b(vocab_size: int = 32000) -> "LlamaConfig":
        return LlamaConfig(vocab_size=vocab_size)

    @staticmethod
    def llama2_13b(vocab_size: int = 32000) -> "LlamaConfig":
        return LlamaConfig(vocab_size=vocab_size, dim=5120, n_layers=40,
                           n_heads=40, n_kv_heads=40, intermediate=13824)

    @staticmethod
    def llama_34b(vocab_size: int = 32000) -> "LlamaConfig":
        """CodeLlama-34B dims — the 34B base the reference's ZeRO-3 stage
        configs target (``zero_stage3_config_70b.json`` family)."""
        return LlamaConfig(vocab_size=vocab_size, dim=8192, n_layers=48,
                           n_heads=64, n_kv_heads=8, intermediate=22016,
                           max_seq_len=4096, rope_theta=1e6)

    @staticmethod
    def llama2_70b(vocab_size: int = 32000) -> "LlamaConfig":
        return LlamaConfig(vocab_size=vocab_size, dim=8192, n_layers=80,
                           n_heads=64, n_kv_heads=8, intermediate=28672,
                           max_seq_len=4096)

    @staticmethod
    def tiny(vocab_size: int = 256, n_layers: int = 2) -> "LlamaConfig":
        """Small config for tests: 2 layers, dim 64, GQA 4:2."""
        return LlamaConfig(vocab_size=vocab_size, dim=64, n_layers=n_layers,
                           n_heads=4, n_kv_heads=2, intermediate=128,
                           max_seq_len=256)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh axes.  ``data`` = pure DP, ``fsdp`` = param-sharded DP
    (ZeRO-3 equivalent), ``model`` = tensor parallel.

    Replaces the reference's DeepSpeed-stage selection (stage2/stage3 JSONs)
    and the vestigial ``pretraining_tp`` branches."""

    data: int = 1
    fsdp: int = 1
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.fsdp * self.model


@dataclasses.dataclass(frozen=True)
class PrecisionConfig:
    """bf16 compute + fp32 master/optimizer state — the reference's
    DeepSpeed bf16 recipe (``stage2-offload.json:22-28``)."""

    param_dtype: str = "float32"       # master copy of trainables
    frozen_dtype: str = "bfloat16"     # frozen base weights
    compute_dtype: str = "bfloat16"
    softmax_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    lr_schedule: str = "cosine"        # cosine with warmup (HF default recipe)
    warmup_ratio: float = 0.03
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    num_epochs: int = 3
    global_batch_size: int = 32
    grad_accum: int = 1
    seed: int = 42
    remat: bool = True                 # gradient checkpointing per layer
    remat_policy: str | None = None    # see models.llama._remat_policy
    rng_impl: str | None = None        # dropout PRNG ('rbg' = fast TPU
                                       # RngBitGenerator; None = threefry)
    log_every: int = 1
    save_every_steps: float = 0        # 0 = only final; 0<x<1 = fraction
                                       # of total steps (reference
                                       # --save_steps 0.1)
    adalora_budget: int = 0            # >0 enables the AdaLoRA rank
                                       # allocator over any adalora params
    adalora_update_every: int = 100
    output_dir: str = "runs/default"


def dump_config(cfg, path: str) -> None:
    """Config snapshot à la the reference's ``saved_config.json``
    (``finetune.py:31-39``)."""
    with open(path, "w") as f:
        json.dump(_asdict(cfg), f, indent=2, default=str)
