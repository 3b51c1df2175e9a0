"""Loss functions binding models to the generic train step."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from moka_tpu.core.config import LlamaConfig
from moka_tpu.models import llama
from moka_tpu.ops.moka import MokaSpec


def make_llama_moka_loss(cfg: LlamaConfig, spec: MokaSpec,
                         remat: bool = True, use_flash: bool = False,
                         fused_loss: bool = False,
                         remat_policy: str | None = None,
                         use_fused_moka: bool = False,
                         context_parallel=None,
                         ce_chunk: int = 128,
                         a8_dots: bool | str = False,
                         pallas_ce: bool = False,
                         host_stream: dict | None = None,
                         ce_rows: bool = False,
                         save_q8: bool | tuple = False):
    """Adapter-only CE loss on a (possibly multimodal-embedded) batch.

    Batch keys: either ``tokens`` (b, L) or ``inputs_embeds`` (b, L, d);
    ``labels`` (b, L) with -100 ignore; optional ``modality_masks`` (M, b, L),
    ``question_mask`` (b, L), ``attn_mask`` (b, L), ``positions`` (b, L).
    use_flash: Pallas flash attention; fused_loss: chunked lm_head+CE;
    remat_policy: see ``llama._remat_policy``; use_fused_moka: the fused
    Pallas adapter kernel (dropout applied outside the kernel);
    context_parallel: (Mesh, axis) for ring-attention sequence sharding.
    host_stream: ``parallel.sharding.stream_shardings(mesh, frozen)`` when
    the frozen base lives in ``pinned_host`` (100B-class param offload):
    layer weights stream host->device per scan iteration, the lm_head is
    DMA'd once before the fused-CE chunk scan.
    save_q8: store the remat-saved projection residuals as per-token int8
    (+fp32 scales) instead of bf16 (``quant.q8_roundtrip``); ``True``
    quantizes exactly the set the active ``remat_policy`` saves.
    """

    def loss_fn(trainable, frozen, batch, rng):
        masks = None
        if "modality_masks" in batch:
            masks = llama.MaskBundle(batch["modality_masks"],
                                     batch["question_mask"])
        out, _ = llama.forward(
            frozen, cfg, adapters=trainable["adapters"], spec=spec,
            tokens=batch.get("tokens"),
            inputs_embeds=batch.get("inputs_embeds"),
            masks=masks, attn_mask=batch.get("attn_mask"),
            positions=batch.get("positions"), remat=remat,
            remat_policy=remat_policy,
            dropout_rng=rng if spec.dropout_rate > 0 else None,
            logits=not fused_loss, use_flash=use_flash,
            use_fused_moka=use_fused_moka, a8_dots=a8_dots,
            save_q8=save_q8,
            context_parallel=context_parallel, host_stream=host_stream)
        if fused_loss:
            lm_head = frozen["lm_head"]
            if host_stream is not None:
                lm_head = jax.device_put(lm_head, host_stream["lm_head"])
            loss = llama.chunked_cross_entropy(out, lm_head,
                                               batch["labels"],
                                               chunk=ce_chunk, a8=a8_dots,
                                               pallas_ce=pallas_ce,
                                               rows_layout=ce_rows)
        else:
            loss = llama.cross_entropy_loss(out, batch["labels"])
        ntok = jnp.sum(batch["labels"] != -100)
        return loss, {"supervised_tokens": ntok}

    return loss_fn
