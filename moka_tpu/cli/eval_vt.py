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
    return p


def load_dataset(args):
    from moka_tpu.data.benchmarks import (MMBenchDataset, MMEDataset,
                                          POPEDataset, SEEDDataset)
    if args.task == "mmbench":
        return MMBenchDataset(args.data)
    if args.task == "mme":
        return MMEDataset(args.data)
    if args.task == "pope":
        return POPEDataset.from_hf(args.data)
    return SEEDDataset(args.data, args.image_root)


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
    cfg = llava.LlavaConfig.vt_7b(vocab_size=tok.vocab_size,
                                  attn_weight=args.attn_weight)
    frozen = {
        "llama": imp.import_llama(imp.load_torch(args.llama_ckpt),
                                  cfg.llama),
        "clip": imp.import_clip(imp.load_torch(args.clip_ckpt), cfg.clip,
                                dtype=jnp.bfloat16),
    }
    trainable = llava.init_trainable(jax.random.key(0), cfg)
    if args.model_ckpt:
        sd = imp.load_torch(args.model_ckpt)
        trainable = imp.import_vt_trainable(sd, cfg, trainable)

    ds = load_dataset(args)
    nq = cfg.projector.num_query_tokens

    def generate_fn(items):
        batch_np = build_eval_batch(items, tok.as_tokenize(), nq,
                                    pad_to=args.pad_to)
        metas = [it["meta"] for it in items]
        answers = [it["answer"] for it in items]
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        toks = llava.generate(trainable, frozen, cfg, batch,
                              max_new_tokens=MAX_NEW[args.task],
                              eos_id=tok.eos_id, pad_id=tok.pad_id)
        rows = []
        for i, t in enumerate(np.asarray(toks)):
            text = tok.decode([x for x in t.tolist() if x != tok.pad_id])
            rows.append({**metas[i], "answer": answers[i],
                         "output": [text]})
        return rows

    path = run_inference(ds, generate_fn, args.output_dir, task=args.task,
                         batch_size=args.batch_size)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
