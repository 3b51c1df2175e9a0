"""VT benchmark eval driver (MMBench / MME / POPE / SEED).

Replaces the four near-identical 650-line drivers in
``VisualText/eval_benchmarks/*/``: rebuild the VT model, load the
fine-tuned state, run strided-sharded greedy generation, write per-rank
JSONL shards in the same row schema the scorers consume
(``mmbench.py:644-661``)."""

from __future__ import annotations

import argparse

import numpy as np

MAX_NEW = {"mmbench": 5, "mme": 50, "pope": 50, "seed": 500}


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("moka-eval-vt")
    p.add_argument("--task", required=True,
                   choices=["mmbench", "mme", "pope", "seed"])
    p.add_argument("--llama-ckpt")
    p.add_argument("--clip-ckpt")
    p.add_argument("--tokenizer-json")
    p.add_argument("--model-ckpt", help="model.safetensors / run dir")
    p.add_argument("--data", help="TSV / data root / json per task")
    p.add_argument("--image-root", help="SEED/POPE image root")
    p.add_argument("--output-dir", default="runs/eval_vt")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--pad-to", type=int, default=1024)
    p.add_argument("--attn-weight", type=float, default=0.05)
    p.add_argument("--model-preset", choices=["7b", "tiny"], default="7b",
                   help="'tiny' = small random-init model for smoke tests")
    p.add_argument("--max-new-tokens", type=int, default=0,
                   help="override the per-task default generation length")
    p.add_argument("--kv-quant", action="store_true",
                   help="int8 decode KV cache (half the cache HBM reads "
                        "per step; pairs with the paged block loop — "
                        "PERFORMANCE.md r4 decode table)")
    p.add_argument("--no-score", action="store_true",
                   help="only write per-rank shards (skip the merge+score "
                        "step; the reference needs a separate scorer run, "
                        "this driver scores in one invocation by default)")
    return p


def load_dataset(args, image_size: int = 224):
    from moka_tpu.data.benchmarks import (MMBenchDataset, MMEDataset,
                                          POPEDataset, SEEDDataset)
    if args.task == "mmbench":
        return MMBenchDataset(args.data, image_size=image_size)
    if args.task == "mme":
        return MMEDataset(args.data, image_size=image_size)
    if args.task == "pope":
        return POPEDataset.from_hf(args.data, image_size=image_size)
    return SEEDDataset(args.data, args.image_root, image_size=image_size)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    from moka_tpu.data.benchmarks import build_eval_batch
    from moka_tpu.data.tokenizer import load_tokenizer
    from moka_tpu.eval.runner import run_inference
    from moka_tpu.models import llava
    from moka_tpu.train import import_torch as imp

    tok = load_tokenizer(args.tokenizer_json)
    if args.model_preset == "tiny":
        import dataclasses as _dc
        base = llava.LlavaConfig.tiny()
        cfg = _dc.replace(base, llama=_dc.replace(
            base.llama, vocab_size=max(tok.vocab_size,
                                       base.llama.vocab_size)))
    else:
        cfg = llava.LlavaConfig.vt_7b(vocab_size=tok.vocab_size,
                                      attn_weight=args.attn_weight)
    if args.llama_ckpt:
        frozen = {
            "llama": imp.import_llama(imp.load_torch(args.llama_ckpt),
                                      cfg.llama),
            "clip": imp.import_clip(imp.load_torch(args.clip_ckpt),
                                    cfg.clip, dtype=jnp.bfloat16),
        }
    else:
        frozen = llava.init_frozen(
            jax.random.key(0), cfg,
            dtype=jnp.float32 if args.model_preset == "tiny"
            else jnp.bfloat16)
    trainable = llava.init_trainable(jax.random.key(0), cfg)
    if args.model_ckpt:
        sd = imp.load_torch(args.model_ckpt)
        trainable = imp.import_vt_trainable(sd, cfg, trainable)

    ds = load_dataset(args, image_size=cfg.clip.image_size)
    nq = cfg.projector.num_query_tokens

    def generate_fn(items):
        batch_np = build_eval_batch(items, tok.as_tokenize(), nq,
                                    pad_to=args.pad_to)
        metas = [it["meta"] for it in items]
        answers = [it["answer"] for it in items]
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        toks = llava.generate(trainable, frozen, cfg, batch,
                              max_new_tokens=args.max_new_tokens or
                              MAX_NEW[args.task],
                              eos_id=tok.eos_id, pad_id=tok.pad_id,
                              kv_quant=args.kv_quant)
        rows = []
        for i, t in enumerate(np.asarray(toks)):
            text = tok.decode([x for x in t.tolist() if x != tok.pad_id])
            rows.append({**metas[i], "answer": answers[i],
                         "output": [text]})
        return rows

    path = run_inference(ds, generate_fn, args.output_dir, task=args.task,
                         batch_size=args.batch_size)
    print(f"wrote {path}")
    if args.no_score:
        return

    # all hosts must finish their shards before rank 0 merges (the
    # reference's dist.barrier before merging — mmbench.py:614-615)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("eval_vt_shards_done")
    if jax.process_index() == 0:
        import json
        import os
        from moka_tpu.eval.scorers import mme, options
        merged = options.merge_rank_files(args.output_dir)
        if args.task in ("mmbench", "seed"):
            scores = options.score_option_file(merged)
        elif args.task == "pope":
            scores = options.score_yesno_file(merged)
        else:
            scores = mme.score_file(merged)
        out_json = os.path.join(args.output_dir, f"scores_{args.task}.json")
        with open(out_json, "w") as f:
            json.dump(scores, f, indent=2)
        print(json.dumps(scores, indent=2))
        print(f"scored -> {out_json}")


if __name__ == "__main__":
    main()
