"""Stage-2 fine-tune driver (MUSIC-AVQA / AVE).

Replaces ``AudioVisualText/scripts/finetune/finetune.py`` + the
``ft_musicavqa.sh`` env zoo: one flag namespace, mesh from flags, no
DeepSpeed JSON.  Recipe defaults mirror the reference
(``ft_musicavqa.sh:24-75``): r=4x3 adapters alpha 16 dropout 0.05
blc_weight 1 on all 7 projections, lr 1e-4 cosine, bf16 frozen base, grad
checkpointing, global batch 32, 3 epochs."""

from __future__ import annotations

import argparse
import json

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("moka-finetune")
    p.add_argument("--llama-ckpt", help="HF LLaMA dir/safetensors")
    p.add_argument("--clip-ckpt", help="HF CLIP vision dir/safetensors")
    p.add_argument("--beats-ckpt", help="BEATs .pt")
    p.add_argument("--tokenizer-json", help="tokenizers-lib tokenizer.json")
    p.add_argument("--vl-pretrain", help="visual projector stage-1 ckpt")
    p.add_argument("--al-pretrain", help="audio projector stage-1 ckpt")
    p.add_argument("--avqa-annotation")
    p.add_argument("--ave-annotation")
    p.add_argument("--ave-data-root")
    p.add_argument("--output-dir", default="runs/finetune")
    p.add_argument("--lora-r", type=int, default=4)
    p.add_argument("--lora-alpha", type=float, default=16.0)
    p.add_argument("--lora-dropout", type=float, default=0.05)
    p.add_argument("--blc-weight", type=float, default=1.0)
    p.add_argument("--question-window", type=int, default=0,
                   help="static rank-attention key window (tokens): scores "
                        "shrink (b,L,L)->(b,L,kq), measured +3%% at 7B; "
                        "assembly fails fast on longer question spans. "
                        "0 = full-length keys")
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--global-batch", type=int, default=32)
    p.add_argument("--pad-to", type=int, default=1024)
    p.add_argument("--save-steps", type=float, default=0,
                   help="absolute steps, or a 0-1 fraction of total steps (reference --save_steps 0.1)")
    p.add_argument("--mesh", default="fsdp",
                   help="'fsdp' | 'data' | 'd,f,m' explicit axis sizes")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--quantize-base", nargs="?", type=int, const=8,
                   default=0, choices=[4, 8], metavar="BITS",
                   help="int8/int4 weight-only frozen base (QLoRA-style); "
                        "bare flag = int8; lets 7B fit one 16GB chip")
    p.add_argument("--quantize-encoders", nargs="?", type=int, const=8,
                   choices=(4, 8), default=0,
                   help="weight-only quantization of the frozen CLIP/BEATs "
                        "towers (they are exactly as frozen as the base — "
                        "multimodal_encoder.py:44,183-186): ~0.45 GB HBM "
                        "freed at 7B-AVT and half the encoder weight reads "
                        "per step; quality anchored alongside the base arms "
                        "(exp_quant_quality.py)")
    p.add_argument("--quantize-head", nargs="?", type=int, const=8,
                   default=0, choices=[4, 8], metavar="BITS",
                   help="with --quantize-base: also quantize the frozen "
                        "lm_head (the chunked-CE scan re-reads it ~3x per "
                        "chunk per step; int8 halves that bandwidth and "
                        "with --a8-dots the CE dot rides the MXU int8 "
                        "path — flagship recipe, quality anchored by the "
                        "int4a8fqh arm of exp_quant_quality.py)")
    p.add_argument("--model-preset",
                   choices=["7b", "13b", "34b", "70b", "tiny"], default="7b",
                   help="LLaMA base size ('tiny' = small random-init model "
                        "for smoke tests)")
    p.add_argument("--loftq-iters", type=int, default=0, metavar="N",
                   help="with --quantize-base: LoftQ adapter init (N rounds "
                        "of quantize-residual SVD, adapters/loftq.py) so "
                        "the adapters start by correcting the base's "
                        "quantization error instead of at zero")
    p.add_argument("--host-offload", action="store_true",
                   help="place the (sharded) frozen base in pinned host "
                        "memory (ZeRO-3 param-offload analog for 100B-class "
                        "bases, zero_stage3_config_100b_1e7_offload.json)")
    p.add_argument("--remat-policy", default="auto",
                   help="per-layer remat policy (see llama._remat_policy); "
                        "'auto' = 'qkvod' for 7b (the tuned single-chip "
                        "recipe), full remat for tiny")
    p.add_argument("--rng-impl", default="rbg",
                   help="dropout PRNG ('rbg' = fast TPU RngBitGenerator, "
                        "'threefry2x32' = jax default)")
    p.add_argument("--shared-dropout-masks", action="store_true",
                   help="one LoRA-dropout mask per distinct adapter input "
                        "(q/k/v; gate/up) instead of per projection — XLA "
                        "CSE collapses the identical chains (+2.5% step "
                        "throughput at 7B).  Same per-element Bernoulli "
                        "rate, but the 1B anchor (drop/dropsh arms, "
                        "exp_quant_quality.py) measures a consistent "
                        "+0.6% mean held-out penalty at 150 steps from "
                        "the lost cross-projection mask independence — "
                        "weigh the trade for your run.  Default OFF = "
                        "reference-faithful independent masks")
    p.add_argument("--a8-dots", nargs="?", const=True, default=False,
                   choices=[True, False, "full"],
                   help="dynamic per-token int8 activations on the "
                        "quantized frozen-base projections (W4A8/W8A8: the "
                        "MXU int8 path).  '--a8-dots full' additionally "
                        "quantizes the backward cotangent so the dX dots "
                        "also run int8 (flagship recipe — quality anchored "
                        "in PERFORMANCE.md, exp_quant_quality.py)")
    p.add_argument("--save-q8", action="store_true",
                   help="int8-quantize the remat save set (the projection "
                        "residuals the --remat-policy keeps between fwd and "
                        "bwd are stored per-token int8 + fp32 scales — half "
                        "the residual HBM; quant.q8_roundtrip, quality "
                        "anchored by the sq8 arm of exp_quant_quality.py)")
    p.add_argument("--adapter-fp32", action="store_true",
                   help="true-fp32 adapter einsums (default: bf16-in/"
                        "fp32-acc, the tuned recipe)")
    p.add_argument("--qformer-question-tokenizer",
                   help="BERT-vocab tokenizer.json: enables instruction-"
                        "aware Q-Former projection (question text fed to the "
                        "projector's text stream; the reference supports it "
                        "but passes None in its live stages)")
    return p


def make_mesh_from_flag(flag: str):
    import jax
    from moka_tpu.core.config import MeshConfig
    from moka_tpu.parallel.mesh import make_mesh
    n = len(jax.devices())
    if flag == "fsdp":
        return make_mesh(MeshConfig(1, n, 1))
    if flag == "data":
        return make_mesh(MeshConfig(n, 1, 1))
    d, f, m = (int(x) for x in flag.split(","))
    return make_mesh(MeshConfig(d, f, m))


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    from moka_tpu.core.config import TrainConfig
    from moka_tpu.data.datasets import Tokenize, UnifiedDataset
    from moka_tpu.data.tokenizer import load_tokenizer
    from moka_tpu.models import unified
    from moka_tpu.ops.moka import MokaSpec
    from moka_tpu.parallel import sharding as shardlib
    from moka_tpu.parallel.mesh import init_distributed
    from moka_tpu.train import import_torch as imp
    from moka_tpu.train.trainer import Trainer

    init_distributed()
    mesh = make_mesh_from_flag(args.mesh)

    spec = MokaSpec.avt(rank=args.lora_r, lora_alpha=args.lora_alpha,
                        blc_weight=args.blc_weight,
                        dropout_rate=args.lora_dropout)
    if not args.adapter_fp32:
        spec = spec.with_bf16_dots()
    if args.question_window:
        spec = spec.with_question_window(args.question_window)
    if args.shared_dropout_masks:
        spec = spec.with_shared_dropout_masks()
    remat_policy = args.remat_policy
    if remat_policy == "auto":
        remat_policy = None if args.model_preset == "tiny" else "qkvod"
    elif remat_policy in ("none", "full"):
        remat_policy = None
    tok = load_tokenizer(args.tokenizer_json)
    if args.model_preset == "tiny":
        base = unified.UnifiedConfig.tiny(spec=spec)
        import dataclasses as _dc
        cfg = _dc.replace(base, llama=_dc.replace(
            base.llama, vocab_size=max(tok.vocab_size, base.llama.vocab_size)))
    else:
        from moka_tpu.core.config import LlamaConfig
        lcfg = {"7b": LlamaConfig.llama2_7b, "13b": LlamaConfig.llama2_13b,
                "34b": LlamaConfig.llama_34b,
                "70b": LlamaConfig.llama2_70b}[args.model_preset](
            vocab_size=tok.vocab_size)
        cfg = unified.UnifiedConfig.avt(lcfg, spec=spec)

    if args.loftq_iters and not args.quantize_base:
        raise SystemExit("--loftq-iters requires --quantize-base")
    if args.quantize_head and not args.quantize_base:
        raise SystemExit("--quantize-head requires --quantize-base")
    loftq_adapters = None

    def _quantize_llama(bf16_tree):
        """Plain symmetric quantization, or LoftQ (quantize + adapter init
        correcting the quantization residual) when --loftq-iters is set."""
        nonlocal loftq_adapters
        if args.loftq_iters:
            from moka_tpu.adapters.loftq import loftq_init_moka_adapters
            qtree, loftq_adapters = loftq_init_moka_adapters(
                bf16_tree, cfg.llama, spec, num_bits=args.quantize_base,
                num_iter=args.loftq_iters)
            if args.quantize_head:
                from moka_tpu.ops.quant import quantize_int4, quantize_int8
                hq = {8: quantize_int8, 4: quantize_int4}[args.quantize_head]
                qtree = dict(qtree)
                qtree["lm_head"] = hq(qtree["lm_head"], axis=-2)
            return qtree
        from moka_tpu.ops.quant import quantize_llama_base
        return quantize_llama_base(bf16_tree, bits=args.quantize_base,
                                   head_bits=args.quantize_head or None)

    # frozen towers from reference checkpoints (random init if absent —
    # debug/smoke mode)
    if args.llama_ckpt:
        if args.quantize_base and not args.loftq_iters:
            from moka_tpu.ops.quant import import_llama_quantized
            llama_params = import_llama_quantized(
                imp.load_torch(args.llama_ckpt), cfg.llama,
                bits=args.quantize_base,
                head_bits=args.quantize_head or None)
        else:
            llama_params = imp.import_llama(
                imp.load_torch(args.llama_ckpt), cfg.llama)
            if args.quantize_base:
                llama_params = _quantize_llama(llama_params)
        frozen = {
            "llama": llama_params,
            "clip": imp.import_clip(imp.load_torch(args.clip_ckpt),
                                    cfg.clip, dtype=jnp.bfloat16),
        }
        beats_sd, beats_cfg = imp.load_torch(args.beats_ckpt)
        frozen["beats"] = imp.import_beats(
            beats_sd, imp.beats_config_from_ckpt(beats_cfg),
            dtype=jnp.bfloat16)
    else:
        frozen = unified.init_frozen(jax.random.key(0), cfg,
                                     dtype=jnp.float32 if
                                     args.model_preset == "tiny" else
                                     jnp.bfloat16)
        if args.quantize_base:
            frozen["llama"] = _quantize_llama(frozen["llama"])
    if args.quantize_encoders:
        from moka_tpu.ops.quant import quantize_encoder
        frozen["clip"] = quantize_encoder(frozen["clip"],
                                          bits=args.quantize_encoders)
        frozen["beats"] = quantize_encoder(frozen["beats"],
                                           bits=args.quantize_encoders)
    frozen = shardlib.shard_params(mesh, frozen,
                                   host_offload=args.host_offload)
    if jax.process_index() == 0:
        q_leaf = frozen["llama"]["layers"]["q"]
        q_arr = (q_leaf.get("w_i8", q_leaf.get("w_i4"))
                 if isinstance(q_leaf, dict) else q_leaf)
        print(f"base q sharding: {q_arr.sharding.spec} "
              f"(quantized={isinstance(q_leaf, dict)})")

    trainable = unified.init_trainable(jax.random.key(args.seed), cfg)
    if loftq_adapters is not None:
        trainable["adapters"] = loftq_adapters
    for flag, key, kind in ((args.vl_pretrain, "vl_projector", "visual"),
                            (args.al_pretrain, "al_projector", "audio")):
        if flag:
            sd = imp.load_torch(flag)
            # stage-1 artifacts may carry a 'model.' wrapper prefix and the
            # resized embed rows; both are dropped (finetune.py:138-148)
            sub = imp.strip_to_submodule(sd, f"{key}.")
            if not sub:
                sd.pop("embed_tokens.weight", None)
                sd.pop("model.embed_tokens.weight", None)
                sub = sd
            trainable[key] = imp.import_projector(
                sub, getattr(cfg, key), kind=kind)

    nq_v = cfg.vl_projector.num_query_tokens
    nq_a = cfg.al_projector.num_query_tokens
    n_frames = 2 if args.model_preset == "tiny" else 10
    qf_tok = None
    if args.qformer_question_tokenizer:
        from tokenizers import Tokenizer as _BertTok
        _bt = _BertTok.from_file(args.qformer_question_tokenizer)
        qf_tok = lambda s: _bt.encode(s).ids  # noqa: E731
    ds = UnifiedDataset(tok.as_tokenize(), mode="train",
                        qformer_tokenize=qf_tok,
                        avqa_annotation=args.avqa_annotation,
                        ave_annotation=args.ave_annotation,
                        ave_data_root=args.ave_data_root,
                        video_frame_nums=n_frames,
                        image_size=cfg.clip.image_size,
                        n_video_tokens=n_frames * nq_v,
                        n_audio_tokens=10 * nq_a,  # 10 audio windows always
                        max_question_tokens=args.question_window or None)
    per_step = args.global_batch
    steps_per_epoch = max(len(ds) // per_step, 1)
    total_steps = steps_per_epoch * args.epochs

    tcfg = TrainConfig(learning_rate=args.learning_rate,
                       num_epochs=args.epochs,
                       global_batch_size=args.global_batch,
                       save_every_steps=args.save_steps,
                       output_dir=args.output_dir, seed=args.seed,
                       remat_policy=remat_policy, rng_impl=args.rng_impl)
    trainer = Trainer(unified.unified_loss(cfg, remat=True,
                                           remat_policy=remat_policy,
                                           use_flash=args.model_preset != "tiny",
                                           fused_loss=args.model_preset != "tiny",
                                           a8_dots=args.a8_dots,
                                           save_q8=args.save_q8),
                      trainable, frozen, tcfg, total_steps, full_config=tcfg)

    def batches():
        # every host draws the SAME global order (same seed), then loads and
        # feeds only its own slice of each global batch -- multi-host data
        # parallelism without a distributed sampler service; video decode +
        # fbank run in a thread pool overlapping the device step.
        # Batches are task-grouped (the UnifiedTrainer sampler,
        # trainer.py:91-160): AVQA and AVE have different audio segment
        # shapes, so a batch must be single-task.
        from moka_tpu.data.prefetch import ParallelLoader
        from moka_tpu.parallel.mesh import host_local_batch_size
        from moka_tpu.train.trainer import host_sharded_order
        rank, world = jax.process_index(), jax.process_count()
        per_host = host_local_batch_size(per_step, mesh)

        def collate(items):
            return {k: jnp.asarray(v) for k, v in
                    ds.collate(items, pad_to=args.pad_to).items()
                    if not isinstance(v, list)}

        group_key = [s["task_name"] for s in ds.samples]
        lengths = [len(s["instruction"]) for s in ds.samples]
        loader = ParallelLoader(ds, collate, batch_size=per_host)
        for epoch in range(args.epochs):
            host_order = host_sharded_order(lengths, group_key, per_step,
                                            rank, world,
                                            seed=args.seed + epoch)
            yield from loader.epoch(host_order)

    trainer.train(batches())
    trainer.finalize()


if __name__ == "__main__":
    main()
