"""Batched distributed inference driver (AVQA / AVE).

Replaces ``AudioVisualText/scripts/finetune/inference_cut.py``: rebuild the
model with the fine-tuned artifacts (orbax run dir or the torch
``adapter_model.bin`` + ``non_lora_trainables.bin``), strided host sharding,
greedy generate(max_new_tokens=500), per-rank JSONL."""

from __future__ import annotations

import argparse

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("moka-infer")
    p.add_argument("--llama-ckpt")
    p.add_argument("--clip-ckpt")
    p.add_argument("--beats-ckpt")
    p.add_argument("--tokenizer-json")
    p.add_argument("--adapter-ckpt", help="adapter_model.bin")
    p.add_argument("--non-lora-ckpt", help="non_lora_trainables.bin")
    p.add_argument("--task", choices=["avqa", "ave"], default="avqa")
    p.add_argument("--annotation")
    p.add_argument("--data-root")
    p.add_argument("--output-dir", default="runs/infer")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=500)
    p.add_argument("--temperature", type=float, default=0.0,
                   help="sampling temperature; 0 = greedy (the reference "
                        "eval recipe). Serving also accepts per-request "
                        "temperature/top_k/top_p/max_new_tokens in the "
                        "HTTP body (max_new_tokens clamped to the server's "
                        "--max-new-tokens)")
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0,
                   help="sampling seed; each batch folds a running counter "
                        "into key(seed) so samples vary across batches and "
                        "runs are reproducible per seed")
    p.add_argument("--pad-to", type=int, default=1024)
    p.add_argument("--lora-r", type=int, default=4)
    p.add_argument("--blc-weight", type=float, default=1.0)
    p.add_argument("--question-window", type=int, default=0,
                   help="static rank-attention key window at prefill "
                        "(tokens); 0 = full-length keys")
    p.add_argument("--quantize-base", nargs="?", type=int, const=8,
                   default=0, choices=[4, 8], metavar="BITS",
                   help="int8/int4 weight-only frozen base (QLoRA-style); "
                        "bare flag = int8; lets 7B fit one 16GB chip")
    p.add_argument("--quantize-head", nargs="?", type=int, const=8,
                   default=0, choices=[4, 8], metavar="BITS",
                   help="with --quantize-base: also quantize the frozen "
                        "lm_head (halves the per-decode-step head read; "
                        "logits stay fp32 off the int32 accumulator)")
    p.add_argument("--kv-quant", action="store_true",
                   help="store the decode KV cache int8 with per-(token, "
                        "head) scales: half the cache HBM reads per decode "
                        "step (the 7B decode bound); greedy outputs are "
                        "parity-tested vs the bf16 cache at tiny scale")
    p.add_argument("--model-preset", choices=["7b", "tiny"], default="7b")
    p.add_argument("--continuous", action="store_true",
                   help="with --serve: continuous batching (slot-based "
                        "decode engine; requests join free lanes mid-"
                        "stream) instead of micro-batch windows")
    p.add_argument("--steps-per-dispatch", type=int, default=8,
                   help="decode steps scanned per device dispatch in the "
                        "continuous engine (amortizes per-dispatch host "
                        "sync; admission latency grows with it)")
    p.add_argument("--pipeline-depth", type=int, default=1,
                   help="decode dispatches kept in flight before the host "
                        "reads their tokens (0 disables pipelining; the "
                        "default overlaps the per-dispatch host sync with "
                        "the next on-device scan)")
    p.add_argument("--serve", action="store_true",
                   help="start the micro-batching HTTP server instead of "
                        "offline JSONL inference")
    p.add_argument("--port", type=int, default=8000)
    return p


def make_serve_generate_fn(tok, trainable, frozen, cfg, *, pad_to: int,
                           max_new_tokens: int, temperature: float = 0.0,
                           top_k: int = 0, top_p: float = 1.0,
                           seed: int = 0):
    """Micro-batched serving generate fn (items -> texts).

    Honors per-request ``temperature``/``top_k``/``top_p`` from the HTTP
    body as per-row arrays (falling back to the server-wide flags) and
    per-request ``max_new_tokens`` by truncating each row of the
    batch-static decode (clamped to the server's ``--max-new-tokens``).
    Each batch folds a running counter into ``key(seed)`` so samples vary
    across batches but runs are reproducible per seed."""
    import itertools
    import jax
    import jax.numpy as jnp
    from moka_tpu.data import assembler as asmb
    from moka_tpu.models import unified

    nq = cfg.vl_projector.num_query_tokens
    batch_counter = itertools.count()

    def generate_texts(items):
        t = tok.as_tokenize()
        assembled, have_img = [], []
        for it in items:
            prompt = it["prompt"]
            ids = np.asarray(t.encode(prompt), np.int64)
            labels = np.full(len(ids), -100, np.int64)
            assembled.append(asmb.assemble_sample(
                ids, labels, t.token_to_id, t.pad_id,
                n_video_tokens=nq if "image" in it else 0,
                n_audio_tokens=0))
            have_img.append("image" in it)
        batch = asmb.pad_batch(assembled, t.pad_id, pad_to=pad_to)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if all(have_img):
            batch["video"] = jnp.asarray(
                np.stack([it["image"] for it in items]))[:, None]
        temps = np.asarray([float(it.get("temperature", temperature))
                            for it in items], np.float32)
        topks = np.asarray([int(it.get("top_k", top_k))
                            for it in items], np.int32)
        topps = np.asarray([float(it.get("top_p", top_p))
                            for it in items], np.float32)
        mnts = [min(int(it.get("max_new_tokens", max_new_tokens)),
                    max_new_tokens) for it in items]
        rng = jax.random.fold_in(jax.random.key(seed), next(batch_counter))
        toks_out = unified.generate(
            trainable, frozen, cfg, batch,
            max_new_tokens=max_new_tokens, eos_id=tok.eos_id,
            pad_id=tok.pad_id, temperature=temps,
            top_k=topks, top_p=topps, rng=rng)
        return [tok.decode([x for x in row.tolist()[:n]
                            if x != tok.pad_id])
                for row, n in zip(np.asarray(toks_out), mnts)]

    return generate_texts


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    from moka_tpu.data.datasets import Tokenize, UnifiedDataset
    from moka_tpu.data.tokenizer import load_tokenizer
    from moka_tpu.eval.runner import run_inference
    from moka_tpu.models import unified
    from moka_tpu.ops.moka import MokaSpec
    from moka_tpu.train import import_torch as imp

    tok = load_tokenizer(args.tokenizer_json)
    spec = MokaSpec.avt(rank=args.lora_r, blc_weight=args.blc_weight,
                        dropout_rate=0.0)
    if args.question_window:
        spec = spec.with_question_window(args.question_window)
    if args.model_preset == "tiny":
        import dataclasses as _dc
        base = unified.UnifiedConfig.tiny(spec=spec)
        cfg = _dc.replace(base, llama=_dc.replace(
            base.llama, vocab_size=max(tok.vocab_size,
                                       base.llama.vocab_size)))
    else:
        cfg = unified.UnifiedConfig.avt_7b(vocab_size=tok.vocab_size,
                                           spec=spec)

    if args.llama_ckpt:
        if args.quantize_base:
            from moka_tpu.ops.quant import import_llama_quantized
            llama_params = import_llama_quantized(
                imp.load_torch(args.llama_ckpt), cfg.llama,
                bits=args.quantize_base,
                head_bits=args.quantize_head or None)
        else:
            llama_params = imp.import_llama(
                imp.load_torch(args.llama_ckpt), cfg.llama)
        frozen = {
            "llama": llama_params,
            "clip": imp.import_clip(imp.load_torch(args.clip_ckpt),
                                    cfg.clip, dtype=jnp.bfloat16),
        }
        sd, bcfg = imp.load_torch(args.beats_ckpt)
        frozen["beats"] = imp.import_beats(
            sd, imp.beats_config_from_ckpt(bcfg), dtype=jnp.bfloat16)
    else:
        import jax as _jax
        frozen = unified.init_frozen(
            _jax.random.key(0), cfg,
            dtype=jnp.float32 if args.model_preset == "tiny"
            else jnp.bfloat16)

    trainable = unified.init_trainable(jax.random.key(0), cfg)
    if args.adapter_ckpt:
        trainable["adapters"] = imp.import_moka_adapters_avt(
            imp.load_torch(args.adapter_ckpt), cfg.llama,
            spec.num_modalities, spec.rank)
    if args.non_lora_ckpt:
        sd = imp.load_torch(args.non_lora_ckpt)
        # wrapper prefixes vary by stage (base_model.model.model. / model.):
        # match by substring, like the reference's strict=False layered load
        vl = imp.strip_to_submodule(sd, "vl_projector.")
        al = imp.strip_to_submodule(sd, "al_projector.")
        if vl:
            trainable["vl_projector"] = imp.import_projector(
                vl, cfg.vl_projector, kind="visual")
        if al:
            trainable["al_projector"] = imp.import_projector(
                al, cfg.al_projector, kind="audio")

    if args.serve and args.continuous:
        # continuous batching: per-request prefill into free decode lanes
        import jax.numpy as jnp
        from moka_tpu.data import assembler as asmb
        from moka_tpu.eval.engine import DecodeEngine
        from moka_tpu.eval.server import serve_continuous
        from moka_tpu.models import llama as llama_mod

        nq = cfg.vl_projector.num_query_tokens
        t = tok.as_tokenize()
        engine = DecodeEngine(
            frozen["llama"], trainable.get("adapters"), cfg=cfg.llama,
            spec=cfg.spec, n_slots=8,
            cache_capacity=args.pad_to + args.max_new_tokens,
            eos_id=tok.eos_id, pad_id=tok.pad_id,
            steps_per_dispatch=args.steps_per_dispatch,
            kv_quant=args.kv_quant, pipeline_depth=args.pipeline_depth)

        def prep(item):
            ids = np.asarray(t.encode(item["prompt"]), np.int64)
            labels = np.full(len(ids), -100, np.int64)
            sample = asmb.assemble_sample(
                ids, labels, t.token_to_id, t.pad_id,
                n_video_tokens=nq if "image" in item else 0,
                n_audio_tokens=0)
            batch = asmb.pad_batch([sample], t.pad_id, pad_to=args.pad_to)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if "image" in item:
                batch["video"] = jnp.asarray(
                    np.stack([item["image"]]))[:, None]
            embeds = unified.build_inputs_embeds(trainable, frozen, cfg,
                                                 batch)
            masks = llama_mod.MaskBundle(batch["modality_masks"],
                                         batch["question_mask"])
            return embeds, batch["attn_mask"], masks

        def decode_txt(toks):
            return tok.decode([int(x) for x in toks
                               if x not in (tok.pad_id, tok.eos_id)])

        server = serve_continuous(engine, prep, decode_txt, port=args.port,
                                  max_new_tokens=args.max_new_tokens)
        print(f"serving (continuous) on :{server.server_address[1]}")
        server.serve_forever()
        return

    if args.serve:
        # serving mode: text(+optional image) prompts through the same model
        from moka_tpu.eval.server import serve
        generate_texts = make_serve_generate_fn(tok, trainable, frozen, cfg,
                                                pad_to=args.pad_to,
                                                max_new_tokens=args.max_new_tokens,
                                                temperature=args.temperature,
                                                top_k=args.top_k,
                                                top_p=args.top_p,
                                                seed=args.seed)
        server = serve(generate_texts, port=args.port)
        print(f"serving on :{server.server_address[1]}")
        server.serve_forever()
        return

    kw = {"avqa_annotation": args.annotation} if args.task == "avqa" else \
         {"ave_annotation": args.annotation, "ave_data_root": args.data_root}
    n_frames = 10 if args.model_preset == "7b" else 2
    ds = UnifiedDataset(tok.as_tokenize(), mode="test",
                        video_frame_nums=n_frames,
                        image_size=cfg.clip.image_size,
                        n_video_tokens=n_frames *
                        cfg.vl_projector.num_query_tokens,
                        n_audio_tokens=10 *
                        cfg.al_projector.num_query_tokens,
                        max_question_tokens=args.question_window or None,
                        **kw)

    import itertools
    batch_counter = itertools.count()

    def generate_fn(items):
        batch = ds.collate(items, pad_to=args.pad_to)
        meta, outputs = batch.pop("meta"), batch.pop("output")
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        rng = jax.random.fold_in(jax.random.key(args.seed),
                                 next(batch_counter))
        toks = unified.generate(trainable, frozen, cfg, batch,
                                max_new_tokens=args.max_new_tokens,
                                eos_id=tok.eos_id, pad_id=tok.pad_id,
                                temperature=args.temperature,
                                top_k=args.top_k, top_p=args.top_p,
                                rng=rng, kv_quant=args.kv_quant)
        rows = []
        for i, t in enumerate(np.asarray(toks)):
            text = tok.decode([x for x in t.tolist() if x != tok.pad_id])
            rows.append({**meta[i], "output": outputs[i], "predict": text})
        return rows

    path = run_inference(ds, generate_fn, args.output_dir,
                         task=args.task, batch_size=args.batch_size)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
