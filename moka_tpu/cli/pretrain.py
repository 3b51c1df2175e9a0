"""Stage-1 projector pretraining driver (captioning).

Replaces ``AudioVisualText/scripts/pretrain/pretrain.py`` +
``pretrain_{visual,audio}.sh``: vanilla-linear decoder (no adapters),
backbone + lm_head frozen, projectors (+ new-token embeddings) trainable;
saves the projector state (= ``non_lora_trainables.bin``,
``pretrain.py:144-148``)."""

from __future__ import annotations

import argparse

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("moka-pretrain")
    p.add_argument("--llama-ckpt")
    p.add_argument("--clip-ckpt")
    p.add_argument("--beats-ckpt")
    p.add_argument("--tokenizer-json")
    p.add_argument("--image-json")
    p.add_argument("--video-json")
    p.add_argument("--audio-json")
    p.add_argument("--branch", choices=["visual", "audio"],
                   default="visual")
    p.add_argument("--output-dir", default="runs/pretrain")
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--global-batch", type=int, default=8)
    p.add_argument("--pad-to", type=int, default=512)
    p.add_argument("--mesh", default="fsdp")
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    from moka_tpu.core.config import TrainConfig
    from moka_tpu.data.datasets import PretrainDataset
    from moka_tpu.data.tokenizer import load_tokenizer
    from moka_tpu.models import unified
    from moka_tpu.parallel import sharding as shardlib
    from moka_tpu.parallel.mesh import init_distributed
    from moka_tpu.train import import_torch as imp
    from moka_tpu.train.trainer import Trainer
    from moka_tpu.cli.finetune import make_mesh_from_flag

    init_distributed()
    # the reference pretrains the two branches in separate runs
    # (pretrain_visual.sh / pretrain_audio.sh); a mixed batch would need
    # both towers and per-modality audio shapes — reject early
    if args.branch == "visual" and args.audio_json:
        raise SystemExit("--branch visual cannot take --audio-json "
                         "(run the audio branch separately, like the "
                         "reference's pretrain_audio.sh)")
    if args.branch == "audio" and (args.image_json or args.video_json):
        raise SystemExit("--branch audio cannot take --image-json/"
                         "--video-json (run the visual branch separately)")
    mesh = make_mesh_from_flag(args.mesh)
    tok = load_tokenizer(args.tokenizer_json)
    cfg = unified.UnifiedConfig.avt_7b(vocab_size=tok.vocab_size)

    frozen = {"llama": imp.import_llama(imp.load_torch(args.llama_ckpt),
                                        cfg.llama)}
    if args.branch == "visual":
        frozen["clip"] = imp.import_clip(imp.load_torch(args.clip_ckpt),
                                         cfg.clip, dtype=jnp.bfloat16)
        frozen["beats"] = None
    else:
        sd, bcfg = imp.load_torch(args.beats_ckpt)
        frozen["beats"] = imp.import_beats(
            sd, imp.beats_config_from_ckpt(bcfg), dtype=jnp.bfloat16)
        frozen["clip"] = None
    frozen = shardlib.shard_params(mesh, frozen)

    trainable = unified.init_trainable(jax.random.key(args.seed), cfg,
                                       with_adapters=False)
    ds = PretrainDataset.from_jsons(
        tok.as_tokenize(), image_json=args.image_json,
        video_json=args.video_json, audio_json=args.audio_json)

    per_step = args.global_batch
    total_steps = max(len(ds) // per_step, 1) * args.epochs
    tcfg = TrainConfig(learning_rate=args.learning_rate,
                       num_epochs=args.epochs,
                       global_batch_size=per_step,
                       output_dir=args.output_dir, seed=args.seed)
    trainer = Trainer(unified.unified_loss(cfg, train_adapters=False),
                      trainable, frozen, tcfg, total_steps)

    # batching left to a UnifiedDataset-style collate over ds items
    from moka_tpu.data import assembler as asm

    def batches():
        rng = np.random.default_rng(args.seed)
        t = tok.as_tokenize()
        for _ in range(args.epochs):
            order = rng.permutation(len(ds))
            for i in range(0, len(order) - per_step + 1, per_step):
                items = [ds[int(j)] for j in order[i:i + per_step]]
                assembled, videos, audios = [], [], []
                for it in items:
                    inst = t.encode(it["instruction"])
                    out = t.encode(it["output"])
                    ids = np.asarray(inst + out)
                    labels = np.asarray([-100] * len(inst) + out)
                    assembled.append(asm.assemble_sample(
                        ids, labels, t.token_to_id, t.pad_id,
                        n_video_tokens=32 if "video" in it else 0,
                        n_audio_tokens=32 if "audio" in it else 0))
                    if "video" in it:
                        videos.append(it["video"])
                    if "audio" in it:
                        audios.append(it["audio"])
                batch = asm.pad_batch(assembled, t.pad_id,
                                      pad_to=args.pad_to)
                if videos:
                    batch["video"] = np.stack(videos)
                if audios:
                    batch["audio"] = np.stack(audios)
                yield {k: jnp.asarray(v) for k, v in batch.items()}

    trainer.train(batches())
    trainer.finalize(stage1=True)


if __name__ == "__main__":
    main()
