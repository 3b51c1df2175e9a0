"""UnifiedForCausalLM equivalent: the tri-modal AVT flagship model.

Ties together CLIP tower + VL projector, BEATs + AL projector, the
multimodal assembler, and the MokA-adapted LLaMA decoder.  Replaces
``AudioVisualText/models/unified_llama.py`` + ``unified_arch.py`` +
``unified_llama_post_pretrian.py`` (stage-1 twin = ``adapters=None``).

Parameter split (the whole ZeRO/freezing story):
  frozen    = {llama, clip, beats}           — bf16, fsdp-sharded, no grads
  trainable = {adapters, vl_projector, al_projector} — fp32, replicated
Stage 1 trains only the projectors (reference ``pretrain.py:71-109``);
stage 2 trains projectors + adapters (``finetune.py:151-160``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from moka_tpu.core.config import LlamaConfig
from moka_tpu.data.assembler import splice_features
from moka_tpu.models import llama
from moka_tpu.models.beats import BeatsConfig, encode_audio_segments
from moka_tpu.models.clip_vit import ClipVitConfig, encode_video
from moka_tpu.models.projectors import (ProjectorConfig, init_projector_params,
                                        project_audio, project_visual)
from moka_tpu.ops.moka import MokaSpec

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UnifiedConfig:
    llama: LlamaConfig
    clip: ClipVitConfig
    beats: BeatsConfig
    vl_projector: ProjectorConfig
    al_projector: ProjectorConfig
    spec: MokaSpec | None
    # CLIP hidden-state selection; only the LAST one's Q-Former output is
    # spliced (unified_arch.py:196-197; actual value [14, 23],
    # configs/unified_config.py:14)
    select_layers: tuple[int, ...] = (14, 23)

    @staticmethod
    def avt(llama: LlamaConfig, spec: MokaSpec | None = None
            ) -> "UnifiedConfig":
        """AVT stack over an arbitrary LLaMA base (7B/13B/34B/70B presets,
        the reference's stage-3 config ladder)."""
        return UnifiedConfig(
            llama=llama,
            clip=ClipVitConfig.vit_l_14(),
            beats=BeatsConfig(),
            vl_projector=ProjectorConfig.visual(d_model=llama.dim),
            al_projector=ProjectorConfig.audio(d_model=llama.dim),
            spec=spec if spec is not None else MokaSpec.avt(rank=4),
        )

    @staticmethod
    def avt_7b(vocab_size: int = 32011, spec: MokaSpec | None = None
               ) -> "UnifiedConfig":
        return UnifiedConfig.avt(LlamaConfig.llama2_7b(
            vocab_size=vocab_size), spec)

    @staticmethod
    def tiny(spec: MokaSpec | None = None) -> "UnifiedConfig":
        lcfg = LlamaConfig.tiny(vocab_size=256)
        return UnifiedConfig(
            llama=lcfg,
            clip=ClipVitConfig.tiny(),
            beats=BeatsConfig.tiny(),
            vl_projector=ProjectorConfig(
                input_width=32, num_query_tokens=4, qformer_hidden=48,
                d_model=lcfg.dim, tokens_per_group=4),
            al_projector=ProjectorConfig(
                input_width=48, num_query_tokens=4, qformer_hidden=48,
                d_model=lcfg.dim, tokens_per_group=-1),
            spec=spec if spec is not None else
            MokaSpec.avt(rank=4, dropout_rate=0.0),
            select_layers=(1, 2),
        )


def init_frozen(rng: Array, cfg: UnifiedConfig, dtype=jnp.bfloat16) -> dict:
    from moka_tpu.models.beats import init_beats_params
    from moka_tpu.models.clip_vit import init_clip_params
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "llama": llama.init_llama_params(k1, cfg.llama, dtype=dtype),
        "clip": init_clip_params(k2, cfg.clip, dtype=dtype),
        "beats": init_beats_params(k3, cfg.beats, dtype=dtype),
    }


def init_trainable(rng: Array, cfg: UnifiedConfig,
                   with_adapters: bool = True,
                   n_new_token_embeds: int = 0,
                   frozen: dict | None = None) -> dict:
    """n_new_token_embeds > 0 adds trainable embedding rows for the appended
    special tokens (stage-1 trains them alongside the projectors and saves
    them in ``non_lora_trainables.bin`` — ``pretrain.py:71-109,144-148``;
    stage-2 discards them, ``finetune.py:138-148`` pops embed_tokens)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    out = {
        "vl_projector": init_projector_params(k1, cfg.vl_projector),
        "al_projector": init_projector_params(k2, cfg.al_projector),
    }
    if with_adapters and cfg.spec is not None:
        out["adapters"] = llama.init_moka_adapters(k3, cfg.llama, cfg.spec)
    if n_new_token_embeds > 0:
        if frozen is not None:
            rows = frozen["llama"]["embed"][-n_new_token_embeds:]
            out["new_token_embeds"] = jnp.asarray(rows, jnp.float32)
        else:
            out["new_token_embeds"] = jax.random.normal(
                k4, (n_new_token_embeds, cfg.llama.dim)) * 0.02
    return out


def encode_modalities(trainable: dict, frozen: dict, cfg: UnifiedConfig,
                      video: Array | None, audio: Array | None,
                      question_ids: Array | None = None,
                      question_text_mask: Array | None = None
                      ) -> tuple[Array | None, Array | None]:
    """video (b, t, 3, H, W) -> (b, t*32, d); audio (b, t, T, 128) fbank ->
    (b, t*32, d).  Encoders run frozen (stop_gradient); projectors train.

    question_ids/question_text_mask: optional BERT-tokenized question for
    instruction-aware Q-Former projection (the reference supports it but
    passes None in both live stages — ``unified_arch.py:185,196,212``)."""
    video_tokens = audio_tokens = None
    if video is not None:
        feats = encode_video(frozen["clip"], cfg.clip,
                             video.astype(frozen["clip"]["patch"].dtype),
                             cfg.select_layers)
        last = jax.lax.stop_gradient(feats[-1].astype(jnp.float32))
        video_tokens = project_visual(trainable["vl_projector"],
                                      cfg.vl_projector, last,
                                      question_ids=question_ids,
                                      question_mask=question_text_mask)
    if audio is not None:
        feats = encode_audio_segments(
            frozen["beats"], cfg.beats,
            audio.astype(frozen["beats"]["patch"].dtype))
        feats = jax.lax.stop_gradient(feats.astype(jnp.float32))
        audio_tokens = project_audio(trainable["al_projector"],
                                     cfg.al_projector, feats,
                                     question_ids=question_ids,
                                     question_mask=question_text_mask)
    return video_tokens, audio_tokens


def _constrain_batch(x, mesh, batch_axes):
    """with_sharding_constraint to P(batch_axes, None, ...) — batch-sharded,
    feature axes replicated.  No-op when mesh is None (single device /
    caller manages shardings)."""
    if mesh is None or x is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = P(batch_axes, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def build_inputs_embeds(trainable: dict, frozen: dict, cfg: UnifiedConfig,
                        batch: dict, mesh=None,
                        batch_axes=("data", "fsdp")) -> Array:
    """Token embeds + feature splice (device-side half of the assembler).

    ``mesh``: when given, the projector outputs and the spliced embeds are
    constrained to batch-sharded/feature-replicated placement.  Without the
    constraint GSPMD infers a d-sharded layout for the projector dot but a
    batch-sharded one for the embed gather, and the splice scatter's JVP
    select falls back to "involuntary full rematerialization"
    (replicate-then-reshard) every step."""
    table = frozen["llama"]["embed"]
    ids = batch["ids"]
    if mesh is not None:
        # The FSDP rule feature-shards the table (P(None,'fsdp')); a gather
        # from it is feature-sharded, and GSPMD cannot reshard that to the
        # batch-sharded layout the decoder wants without an involuntary full
        # rematerialization.  Replicating the table first (an all-gather on
        # an existing dim — cheap next to the per-layer FSDP gathers) and
        # batch-sharding the ids makes the gather partition trivially.
        from jax.sharding import NamedSharding, PartitionSpec as P
        table = jax.lax.with_sharding_constraint(
            table, NamedSharding(mesh, P(None, None)))
        ids = jax.lax.with_sharding_constraint(
            ids, NamedSharding(mesh, P(batch_axes, None)))
    embeds = jnp.take(table, ids, axis=0)
    if "new_token_embeds" in trainable:
        # overlay the trainable rows for the appended special tokens
        new = trainable["new_token_embeds"]
        base = cfg.llama.vocab_size - new.shape[0]
        idx = jnp.clip(ids - base, 0, new.shape[0] - 1)
        overlay = jnp.take(new, idx, axis=0).astype(embeds.dtype)
        embeds = jnp.where((ids >= base)[..., None], overlay, embeds)
    video_tokens, audio_tokens = encode_modalities(
        trainable, frozen, cfg, batch.get("video"), batch.get("audio"),
        question_ids=batch.get("qformer_question_ids"),
        question_text_mask=batch.get("qformer_question_mask"))
    embeds = _constrain_batch(embeds, mesh, batch_axes)
    video_tokens = _constrain_batch(video_tokens, mesh, batch_axes)
    audio_tokens = _constrain_batch(audio_tokens, mesh, batch_axes)
    spliced = splice_features(embeds,
                              video_features=video_tokens,
                              video_pos=batch.get("video_pos"),
                              audio_features=audio_tokens,
                              audio_pos=batch.get("audio_pos"))
    return _constrain_batch(spliced, mesh, batch_axes)


def unified_loss(cfg: UnifiedConfig, remat: bool = True,
                 train_adapters: bool = True, use_flash: bool = False,
                 fused_loss: bool = False,
                 remat_policy: str | None = None,
                 mesh=None, batch_axes=("data", "fsdp"),
                 a8_dots: bool | str = False,
                 save_q8: bool | tuple = False):
    """Loss closure for the generic train step.  ``train_adapters=False`` =
    stage-1 pretraining (plain-linear twin: no adapter deltas at all,
    ``modeling_llama_post_pretrian.py``).  ``remat_policy``: see
    ``llama._remat_policy`` ('qkvod' is the tuned 7B single-chip recipe).
    ``mesh``: pass the training mesh so the encoder→splice boundary gets
    batch-sharded constraints (reshard-clean multichip step — see
    ``build_inputs_embeds``)."""

    def loss_fn(trainable, frozen, batch, rng):
        embeds = build_inputs_embeds(trainable, frozen, cfg, batch,
                                     mesh=mesh, batch_axes=batch_axes)
        masks = llama.MaskBundle(batch["modality_masks"],
                                 batch["question_mask"])
        adapters = trainable.get("adapters") if train_adapters else None
        spec = cfg.spec if adapters is not None else None
        out, _ = llama.forward(
            frozen["llama"], cfg.llama, adapters=adapters, spec=spec,
            inputs_embeds=embeds, masks=masks if adapters is not None else None,
            attn_mask=batch["attn_mask"], positions=batch["positions"],
            remat=remat, remat_policy=remat_policy, use_flash=use_flash,
            logits=not fused_loss, a8_dots=a8_dots, save_q8=save_q8,
            dropout_rng=rng if (spec and spec.dropout_rate > 0) else None)
        if fused_loss:
            loss = llama.chunked_cross_entropy(
                out, frozen["llama"]["lm_head"], batch["labels"],
                a8=a8_dots)
        else:
            loss = llama.cross_entropy_loss(out, batch["labels"])
        return loss, {"supervised_tokens":
                      jnp.sum(batch["labels"] != -100)}

    return loss_fn


def generate(trainable: dict, frozen: dict, cfg: UnifiedConfig, batch: dict,
             max_new_tokens: int, eos_id: int, pad_id: int = 0,
             temperature: float = 0.0, top_k: int = 0,
             top_p: float = 1.0, rng=None, kv_quant: bool = False) -> Array:
    """Multimodal generation (replaces UnifiedForCausalLM.generate + the
    forked GenerationMixin).  Greedy by default (the reference's eval
    drivers all run ``do_sample=False``); a nonzero ``temperature`` samples
    with the optional top-k / top-p warpers (``eval/sampling.py``).
    ``temperature``/``top_k``/``top_p`` may be scalars or per-row (b,)
    arrays (rows with temperature 0 decode greedily).  ``kv_quant`` stores
    the decode KV cache int8 (half the cache HBM reads per step)."""
    import numpy as np
    from moka_tpu.eval.decode import greedy_generate, sample_generate
    embeds = build_inputs_embeds(trainable, frozen, cfg, batch)
    masks = llama.MaskBundle(batch["modality_masks"], batch["question_mask"])
    common = dict(cfg=cfg.llama, spec=cfg.spec, inputs_embeds=embeds,
                  prompt_mask=batch["attn_mask"], masks=masks,
                  max_new_tokens=max_new_tokens, eos_id=eos_id,
                  pad_id=pad_id, kv_quant=kv_quant)
    if np.any(np.asarray(temperature) > 0):
        return sample_generate(
            frozen["llama"], trainable.get("adapters"), rng=rng,
            temperature=temperature, top_k=top_k, top_p=top_p, **common)
    return greedy_generate(
        frozen["llama"], trainable.get("adapters"), **common)
