"""VT (LLaVA-Instruct) fine-tune driver.

Replaces ``VisualText/train/train.py`` + ``shell/train.sh``: builds the
bi-modal model from LLaMA-2 + CLIP, loads the stage-1
``visual_pretrain.bin`` into the projector, trains projector + dual-adapter
MokA (r=4, attn_weight 0.05, lr 1e-4, 2 epochs, global batch 32 —
``shell/train.sh:64-90``), and saves the full trainable state as
``model.safetensors`` in the reference schema (consumed strict by the eval
drivers)."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("moka-train-vt")
    p.add_argument("--llama-ckpt")
    p.add_argument("--clip-ckpt")
    p.add_argument("--tokenizer-json")
    p.add_argument("--visual-pretrain", help="stage-1 projector ckpt")
    p.add_argument("--data-json", help="LLaVA-Instruct-style json")
    p.add_argument("--image-root", help="COCO train2017 root")
    p.add_argument("--output-dir", default="runs/train_vt")
    p.add_argument("--attn-weight", type=float, default=0.05)
    p.add_argument("--lora-r", type=int, default=4)
    p.add_argument("--lora-alpha", type=float, default=16.0)
    p.add_argument("--lora-dropout", type=float, default=0.05)
    p.add_argument("--question-window", type=int, default=0,
                   help="static rank-attention key window (tokens); "
                        "0 = full-length keys")
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--global-batch", type=int, default=32)
    p.add_argument("--pad-to", type=int, default=1024)
    p.add_argument("--mesh", default="fsdp")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--save-steps", type=float, default=0,
                   help="absolute steps, or a 0-1 fraction of total steps")
    p.add_argument("--quantize-base", nargs="?", type=int, const=8,
                   default=0, choices=[4, 8], metavar="BITS",
                   help="int8/int4 weight-only frozen LLaMA base "
                        "(QLoRA-style); bare flag = int8")
    p.add_argument("--quantize-head", nargs="?", type=int, const=8,
                   default=0, choices=[4, 8], metavar="BITS",
                   help="with --quantize-base: also quantize the frozen "
                        "lm_head (halves chunked-CE head bandwidth)")
    p.add_argument("--remat-policy", default="auto",
                   help="per-layer remat policy (see llama._remat_policy); "
                        "'auto' = 'qkvod' (the tuned single-chip recipe)")
    p.add_argument("--host-offload", action="store_true",
                   help="place the (sharded) frozen base in pinned host "
                        "memory")
    p.add_argument("--model-preset", choices=["7b", "tiny"], default="7b",
                   help="'tiny' = small random-init model for smoke tests "
                        "(no checkpoints needed)")
    p.add_argument("--a8-dots", nargs="?", const=True, default=False,
                   choices=[True, False, "full"],
                   help="dynamic per-token int8 activations on the "
                        "quantized frozen-base projections (W4A8/W8A8); "
                        "'full' also quantizes the backward cotangent "
                        "(the VT flagship bench recipe)")
    p.add_argument("--quantize-encoders", nargs="?", type=int, const=8,
                   default=0, choices=[4, 8], metavar="BITS",
                   help="weight-only int8/int4 on the frozen CLIP tower")
    p.add_argument("--save-q8", action="store_true",
                   help="int8-quantize the remat save set "
                        "(quant.q8_roundtrip; see finetune --save-q8)")
    return p


def iter_vt_samples(data_json: str, image_root: str, tokenize, pad_id: int,
                    image_placeholder_id: int, num_image_tokens: int = 32,
                    image_size: int = 224):
    """LLaVA-Instruct conversations -> single-turn VT samples
    (``train/train.py:75-156``: multi-turn split, <image> x32 expansion,
    [/INST]...</s> target spans)."""
    from moka_tpu.data.datasets import llama2_chat_prompt
    from moka_tpu.data.video import load_image
    from moka_tpu.data.vt_dataset import build_vt_sample

    with open(data_json) as f:
        rows = json.load(f)
    for row in rows:
        convs = row.get("conversations", [])
        image_path = os.path.join(image_root, row.get("image", ""))
        for i in range(0, len(convs) - 1, 2):
            if convs[i].get("from") != "human":
                continue
            user = convs[i]["value"].replace(
                "<image>", "<image>" * num_image_tokens, 1)
            answer = convs[i + 1]["value"]
            prompt = llama2_chat_prompt(user) + " " + answer + "</s>"
            ids = np.asarray(tokenize.encode(prompt), np.int64)
            # supervise everything after the chat prompt
            n_prompt = len(tokenize.encode(llama2_chat_prompt(user)))
            labels = np.full(len(ids), -100, np.int64)
            labels[n_prompt:] = ids[n_prompt:]
            sample = build_vt_sample(ids, labels, image_placeholder_id,
                                    pad_id, num_image_tokens)
            sample["pixel_values"] = load_image(image_path, size=image_size)
            yield sample


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    from moka_tpu.core.config import TrainConfig
    from moka_tpu.cli.finetune import make_mesh_from_flag
    from moka_tpu.data.tokenizer import load_tokenizer
    from moka_tpu.data.vt_dataset import collate_vt
    from moka_tpu.models import llava
    from moka_tpu.ops.moka import MokaSpec
    from moka_tpu.parallel import sharding as shardlib
    from moka_tpu.parallel.mesh import init_distributed
    from moka_tpu.train import checkpoint as ckpt
    from moka_tpu.train import import_torch as imp
    from moka_tpu.train.trainer import Trainer

    init_distributed()
    mesh = make_mesh_from_flag(args.mesh)
    tok = load_tokenizer(args.tokenizer_json)
    if args.model_preset == "tiny":
        import dataclasses as _dc
        base = llava.LlavaConfig.tiny()
        cfg = _dc.replace(
            base,
            llama=_dc.replace(base.llama, vocab_size=max(
                tok.vocab_size, base.llama.vocab_size)),
            spec=MokaSpec.vt(rank=args.lora_r, lora_alpha=args.lora_alpha,
                             attn_weight=args.attn_weight,
                             dropout_rate=args.lora_dropout))
    else:
        cfg = llava.LlavaConfig.vt_7b(vocab_size=tok.vocab_size,
                                      attn_weight=args.attn_weight,
                                      rank=args.lora_r,
                                      lora_alpha=args.lora_alpha,
                                      dropout_rate=args.lora_dropout)
    if args.question_window:
        import dataclasses as _dc
        cfg = _dc.replace(
            cfg, spec=cfg.spec.with_question_window(args.question_window))
    remat_policy = args.remat_policy
    if remat_policy == "auto":
        remat_policy = None if args.model_preset == "tiny" else "qkvod"
    elif remat_policy in ("none", "full"):
        remat_policy = None
    if args.llama_ckpt:
        if args.quantize_base:
            from moka_tpu.ops.quant import import_llama_quantized
            llama_params = import_llama_quantized(
                imp.load_torch(args.llama_ckpt), cfg.llama,
                bits=args.quantize_base,
                head_bits=args.quantize_head or None)
        else:
            llama_params = imp.import_llama(imp.load_torch(args.llama_ckpt),
                                            cfg.llama)
        frozen = {
            "llama": llama_params,
            "clip": imp.import_clip(imp.load_torch(args.clip_ckpt),
                                    cfg.clip, dtype=jnp.bfloat16),
        }
    else:
        # random init (smoke / debug mode, like finetune without ckpts)
        frozen = llava.init_frozen(
            jax.random.key(0), cfg,
            dtype=jnp.float32 if args.model_preset == "tiny"
            else jnp.bfloat16)
        if args.quantize_base:
            from moka_tpu.ops.quant import quantize_llama_base
            frozen["llama"] = quantize_llama_base(
                frozen["llama"], bits=args.quantize_base,
                head_bits=args.quantize_head or None)
    if args.quantize_encoders:
        from moka_tpu.ops.quant import quantize_encoder
        frozen["clip"] = quantize_encoder(frozen["clip"],
                                          bits=args.quantize_encoders)
    frozen = shardlib.shard_params(mesh, frozen,
                                   host_offload=args.host_offload)
    trainable = llava.init_trainable(jax.random.key(args.seed), cfg)
    if args.visual_pretrain:
        sd = imp.load_torch(args.visual_pretrain)
        trainable = imp.import_vt_trainable(sd, cfg, trainable)

    image_ph = tok.token_to_id["<image>"]
    samples = list(iter_vt_samples(args.data_json, args.image_root,
                                   tok.as_tokenize(), tok.pad_id, image_ph,
                                   cfg.projector.num_query_tokens,
                                   image_size=cfg.clip.image_size))
    per_step = args.global_batch
    total_steps = max(len(samples) // per_step, 1) * args.epochs
    tcfg = TrainConfig(learning_rate=args.learning_rate,
                       num_epochs=args.epochs, global_batch_size=per_step,
                       save_every_steps=args.save_steps,
                       output_dir=args.output_dir, seed=args.seed,
                       remat_policy=remat_policy)
    trainer = Trainer(llava.llava_loss(cfg, remat=True,
                                       use_flash=args.model_preset != "tiny",
                                       fused_loss=args.model_preset != "tiny",
                                       remat_policy=remat_policy,
                                       a8_dots=args.a8_dots,
                                       save_q8=args.save_q8),
                      trainable, frozen, tcfg, total_steps)

    def batches():
        rng = np.random.default_rng(args.seed)
        for _ in range(args.epochs):
            order = rng.permutation(len(samples))
            for i in range(0, len(order) - per_step + 1, per_step):
                batch_items = [samples[int(j)] for j in order[i:i + per_step]]
                pix = np.stack([s.pop("pixel_values") for s in batch_items])
                batch = collate_vt(batch_items, tok.pad_id,
                                   pad_to=args.pad_to,
                                   max_question_tokens=args.question_window
                                   or None,
                                   question_overflow="disable")
                for s, p in zip(batch_items, pix):
                    s["pixel_values"] = p
                batch["pixel_values"] = pix
                yield {k: jnp.asarray(v) for k, v in batch.items()}

    state = trainer.train(batches())
    if jax.process_index() == 0:
        ckpt.save_vt_safetensors(
            os.path.join(args.output_dir, "model.safetensors"),
            state.params, cfg)
    trainer.finalize()


if __name__ == "__main__":
    main()
