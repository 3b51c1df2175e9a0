"""VL / AL projectors: LayerNorm -> 2-layer Q-Former -> 2-layer MLP -> d_model.

Reference: ``AudioVisualText/models/multimodal_encoder.py:84-165`` (VLProjector)
and ``:205-280`` (ALProjector).  Both share the recipe: input LayerNorm, a
2-layer BERT Q-Former with cross-attention every layer and 32 learnable query
tokens, then ``build_mlp(depth=2)`` = Linear(hidden, d_model) -> GELU ->
Linear(d_model, d_model) (``multimodal_encoder.py:22-27``).

These are the TRAINABLE modules of stage 1 (plus, with the adapters, of
stage 2) — their params live in the trainable pytree.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from moka_tpu.models.qformer import (QFormerConfig, init_qformer_params,
                                     qformer_encode, _ln)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ProjectorConfig:
    input_width: int = 1024         # 1024 CLIP / 768 BEATs
    num_query_tokens: int = 32
    qformer_layers: int = 2
    qformer_hidden: int = 768
    qformer_heads: int = 12
    qformer_intermediate: int = 3072
    d_model: int = 4096
    tokens_per_group: int = 256     # CLIP patches per frame / BEATs tokens
    ln_eps: float = 1e-12

    def qformer(self) -> QFormerConfig:
        return QFormerConfig(hidden=self.qformer_hidden,
                             n_layers=self.qformer_layers,
                             n_heads=self.qformer_heads,
                             intermediate=self.qformer_intermediate,
                             encoder_width=self.input_width,
                             num_query_tokens=self.num_query_tokens)

    @staticmethod
    def visual(d_model: int = 4096) -> "ProjectorConfig":
        return ProjectorConfig(input_width=1024, tokens_per_group=256,
                               d_model=d_model)

    @staticmethod
    def audio(d_model: int = 4096) -> "ProjectorConfig":
        # audio groups vary in token count; tokens_per_group unused there
        return ProjectorConfig(input_width=768, tokens_per_group=-1,
                               d_model=d_model)


def init_projector_params(rng: Array, cfg: ProjectorConfig) -> dict:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    h, d = cfg.qformer_hidden, cfg.d_model
    return {
        "input_ln": {"g": jnp.ones((cfg.input_width,)),
                     "b": jnp.zeros((cfg.input_width,))},
        "qformer": init_qformer_params(k1, cfg.qformer()),
        "mlp": {
            "fc1": {"w": jax.random.normal(k2, (h, d)) * 0.02,
                    "b": jnp.zeros((d,))},
            "fc2": {"w": jax.random.normal(k3, (d, d)) * 0.02,
                    "b": jnp.zeros((d,))},
        },
    }


def _mlp(x, p):
    x = jnp.einsum("...d,df->...f", x, p["fc1"]["w"]) + p["fc1"]["b"]
    x = jax.nn.gelu(x, approximate=False)
    return jnp.einsum("...d,df->...f", x, p["fc2"]["w"]) + p["fc2"]["b"]


def project_visual(params: dict, cfg: ProjectorConfig, features: Array,
                   question_ids: Array | None = None,
                   question_mask: Array | None = None) -> Array:
    """(b, t*n, width) CLIP features -> (b, t*32, d_model)
    (``VLProjector.forward``, multimodal_encoder.py:116-165).

    question conditioning: token ids broadcast to every frame group
    (``multimodal_encoder.py:139-140``); None in stage 2."""
    b, tn, w = features.shape
    t = tn // cfg.tokens_per_group
    x = features.reshape(b * t, cfg.tokens_per_group, w)
    x = _ln(x, params["input_ln"], 1e-5)  # nn.LayerNorm default eps
    if question_ids is not None:
        qi = jnp.repeat(question_ids, t, axis=0)
        qm = jnp.repeat(question_mask, t, axis=0)
    else:
        qi, qm = None, None
    q = qformer_encode(params["qformer"], cfg.qformer(), x,
                       text_ids=qi, text_mask=qm)
    out = _mlp(q, params["mlp"])  # (b*t, 32, d_model)
    return out.reshape(b, t * cfg.num_query_tokens, cfg.d_model)


def project_audio(params: dict, cfg: ProjectorConfig, features: Array,
                  question_ids: Array | None = None,
                  question_mask: Array | None = None) -> Array:
    """(b, t, n, width) BEATs features -> (b, t*32, d_model)
    (``ALProjector.forward``, multimodal_encoder.py:236-280)."""
    b, t, n, w = features.shape
    x = features.reshape(b * t, n, w)
    x = _ln(x, params["input_ln"], 1e-5)
    if question_ids is not None:
        qi = jnp.repeat(question_ids, t, axis=0)
        qm = jnp.repeat(question_mask, t, axis=0)
    else:
        qi, qm = None, None
    q = qformer_encode(params["qformer"], cfg.qformer(), x,
                       text_ids=qi, text_mask=qm)
    out = _mlp(q, params["mlp"])
    return out.reshape(b, t * cfg.num_query_tokens, cfg.d_model)
