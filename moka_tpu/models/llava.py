"""LLaVA-style bi-modal (image+text) model — the VisualText subproject.

Reference: ``VisualText/modified_models/modelling_llava.py`` (CLIP tower +
Q-Former ``multi_modal_projector`` instead of the stock MLP, :183;
``get_image_features`` selects ``vision_feature_layer=-2`` and drops CLS,
:200-264; features spliced by ``masked_scatter`` over image-token positions,
:316-333) + ``modified_models/modeling_llama.py`` (masks gated off at decode
steps, :310-329).

Here the dual-adapter MokA ('image'/'text' named adapters with shared B,
``modified_peft/tuners/lora/layer.py``) is the same ``MokaSpec.vt`` flavor
of the one MokA op; the image-position splice reuses the assembler scatter
(positions come from the dataset, replacing the masked_scatter over
``image_token_id==0``)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from moka_tpu.core.config import LlamaConfig
from moka_tpu.data.assembler import splice_features
from moka_tpu.models import llama
from moka_tpu.models.clip_vit import ClipVitConfig, clip_hidden_states
from moka_tpu.models.projectors import (ProjectorConfig, init_projector_params,
                                        project_visual)
from moka_tpu.ops.moka import MokaSpec

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    llama: LlamaConfig
    clip: ClipVitConfig
    projector: ProjectorConfig
    spec: MokaSpec
    # hidden_states index for vision features; -2 == layer n_layers-1 output
    # (modelling_llava.py:200-264)
    vision_feature_layer: int = -2

    @staticmethod
    def vt_7b(vocab_size: int = 32000, attn_weight: float = 0.05,
              rank: int = 4, lora_alpha: float = 16.0,
              dropout_rate: float = 0.05) -> "LlavaConfig":
        return LlavaConfig(
            llama=LlamaConfig.llama2_7b(vocab_size=vocab_size),
            clip=ClipVitConfig.vit_l_14(),
            projector=ProjectorConfig.visual(d_model=4096),
            spec=MokaSpec.vt(rank=rank, lora_alpha=lora_alpha,
                             attn_weight=attn_weight,
                             dropout_rate=dropout_rate),
        )

    @staticmethod
    def tiny() -> "LlavaConfig":
        lcfg = LlamaConfig.tiny(vocab_size=256)
        return LlavaConfig(
            llama=lcfg,
            clip=ClipVitConfig.tiny(),
            projector=ProjectorConfig(
                input_width=32, num_query_tokens=4, qformer_hidden=48,
                d_model=lcfg.dim, tokens_per_group=4),
            spec=MokaSpec.vt(rank=4, dropout_rate=0.0),
        )

    @property
    def select_layer(self) -> int:
        n = self.clip.n_layers
        return n + 1 + self.vision_feature_layer if \
            self.vision_feature_layer < 0 else self.vision_feature_layer


def init_frozen(rng: Array, cfg: LlavaConfig, dtype=jnp.bfloat16) -> dict:
    from moka_tpu.models.clip_vit import init_clip_params
    k1, k2 = jax.random.split(rng)
    return {"llama": llama.init_llama_params(k1, cfg.llama, dtype=dtype),
            "clip": init_clip_params(k2, cfg.clip, dtype=dtype)}


def init_trainable(rng: Array, cfg: LlavaConfig) -> dict:
    k1, k2 = jax.random.split(rng)
    return {"projector": init_projector_params(k1, cfg.projector),
            "adapters": llama.init_moka_adapters(k2, cfg.llama, cfg.spec)}


def image_features(trainable: dict, frozen: dict, cfg: LlavaConfig,
                   pixel_values: Array) -> Array:
    """(b, 3, H, W) -> (b, 32, d_model): CLIP layer -2, CLS dropped, through
    the Q-Former projector (trainable)."""
    feats = clip_hidden_states(
        frozen["clip"], cfg.clip,
        pixel_values.astype(frozen["clip"]["patch"].dtype),
        (cfg.select_layer,))[0]
    feats = jax.lax.stop_gradient(feats.astype(jnp.float32))
    return project_visual(trainable["projector"], cfg.projector, feats)


def build_inputs_embeds(trainable: dict, frozen: dict, cfg: LlavaConfig,
                        batch: dict) -> Array:
    embeds = jnp.take(frozen["llama"]["embed"], batch["ids"], axis=0)
    if "pixel_values" in batch:
        feats = image_features(trainable, frozen, cfg, batch["pixel_values"])
        embeds = splice_features(embeds, video_features=feats,
                                 video_pos=batch["image_pos"])
    return embeds


def _masks(batch: dict) -> llama.MaskBundle:
    mod = jnp.stack([batch["text_mask"], batch["image_mask"]])
    return llama.MaskBundle(mod, batch["question_mask"])


def llava_loss(cfg: LlavaConfig, remat: bool = True,
               use_flash: bool = False, fused_loss: bool = False,
               remat_policy: str | None = None,
               a8_dots: bool | str = False,
               save_q8: bool | tuple = False):
    def loss_fn(trainable, frozen, batch, rng):
        embeds = build_inputs_embeds(trainable, frozen, cfg, batch)
        out, _ = llama.forward(
            frozen["llama"], cfg.llama, adapters=trainable["adapters"],
            spec=cfg.spec, inputs_embeds=embeds, masks=_masks(batch),
            attn_mask=batch.get("attn_mask"),
            positions=batch.get("positions"), remat=remat,
            remat_policy=remat_policy,
            use_flash=use_flash, logits=not fused_loss, a8_dots=a8_dots,
            save_q8=save_q8,
            dropout_rng=rng if cfg.spec.dropout_rate > 0 else None)
        if fused_loss:
            loss = llama.chunked_cross_entropy(
                out, frozen["llama"]["lm_head"], batch["labels"],
                a8=a8_dots)
        else:
            loss = llama.cross_entropy_loss(out, batch["labels"])
        return loss, {"supervised_tokens": jnp.sum(batch["labels"] != -100)}

    return loss_fn


def generate(trainable: dict, frozen: dict, cfg: LlavaConfig, batch: dict,
             max_new_tokens: int, eos_id: int, pad_id: int = 0,
             kv_quant: bool = False) -> Array:
    from moka_tpu.eval.decode import greedy_generate
    embeds = build_inputs_embeds(trainable, frozen, cfg, batch)
    return greedy_generate(
        frozen["llama"], trainable["adapters"], cfg=cfg.llama, spec=cfg.spec,
        inputs_embeds=embeds, prompt_mask=batch["attn_mask"],
        masks=_masks(batch), max_new_tokens=max_new_tokens, eos_id=eos_id,
        pad_id=pad_id, kv_quant=kv_quant)
