"""Quality anchor for the int8/int4 frozen base (VERDICT r2 item 2).

The flagship bench quantizes the frozen LLaMA base (QLoRA-style weight-only
int8/int4); the reference trains against a bf16 base (``ft_musicavqa.sh:41``).
This experiment grounds the numerics claim without real weights: same seed,
same data stream, same adapter init — only the frozen base's storage format
differs (the bf16 tree vs the SAME tree quantized to int8 / int4) — then
compares training-loss curves and a held-out loss on a structured task the
adapters must actually learn (answer token = question token + K, routed
through modality masks so the full MokA path is exercised).

Usage:
    python exp_quant_quality.py --one bf16|int8|int4 [--scale tiny|1b] [--seed N] [--steps K]
    python exp_quant_quality.py --one enc8 [--scale 1b]   # encoder arm
    python exp_quant_quality.py [--scale 1b] [--seeds K]  # full sweep,
        K seeds per arm, mean +/- std table (VERDICT r3 item 6)

Encoder arms (encbf16/enc8/enc4) anchor the quantized frozen CLIP/BEATs
towers (ops/quant.quantize_encoder): the held-out task keys the ANSWER to
the video content (a class-coded frame pattern), so the loss measures
whether class information survives tower quantization end to end — the base
stays at the flagship int4+a8f+qh recipe in every encoder arm.

Tiny scale runs on CPU (used by tests/test_quant_quality.py); 1b runs on the
chip (PERFORMANCE.md table).
"""

from __future__ import annotations

import json
import subprocess
import sys

import numpy as np

STEPS = {"tiny": 200, "1b": 150}
EVAL_EVERY = {"tiny": 20, "1b": 10}
BATCH = {"tiny": 8, "1b": 8}
SEQLEN = {"tiny": 64, "1b": 512}


def _config(scale: str):
    from moka_tpu.core.config import LlamaConfig
    if scale == "tiny":
        return LlamaConfig.tiny(vocab_size=256)
    if scale == "1b":
        return LlamaConfig(vocab_size=32011, dim=2048, n_layers=16,
                           n_heads=16, n_kv_heads=16, intermediate=5504)
    raise ValueError(scale)


def _make_batch(rng: np.random.Generator, b: int, L: int, vocab: int):
    """Structured task: a text prefix (noise), a video span, an audio span,
    a question of 8 tokens from [4, half), and an 8-token answer where
    answer_i = question_i + (half - 4).  Only answers are supervised, so the
    loss measures whether the adapters learn the mapping + routing."""
    half = vocab // 2
    nq = 8
    n_mm = max(4, L // 8)
    ids = rng.integers(4, half, (b, L)).astype(np.int32)
    labels = np.full((b, L), -100, np.int32)
    mod = np.zeros((3, b, L), np.float32)
    qm = np.zeros((b, L), np.float32)
    # layout: [prefix | video span | audio span | question | answer | pad...]
    p = L - 2 * n_mm - 2 * nq - 2
    mod[0, :, :] = 1.0
    mod[1, :, p: p + n_mm] = 1
    mod[2, :, p + n_mm: p + 2 * n_mm] = 1
    mod[0] -= mod[1] + mod[2]
    qs = p + 2 * n_mm
    # question tokens from a 16-symbol alphabet; answer_i = question_i + half.
    # Two levels of structure: the answer marginal (16 of `vocab` symbols —
    # easy, learnable via output-projection bias shift) and the token-level
    # mapping (needs question->answer routing through the frozen base).
    # Floor = uniform over the answer alphabet = ln(16) ≈ 2.77 nats.
    q_toks = rng.integers(4, 20, (b, nq)).astype(np.int32)
    ids[:, qs: qs + nq] = q_toks
    qm[:, qs: qs + nq] = 1
    a_toks = q_toks + half
    ids[:, qs + nq: qs + 2 * nq] = a_toks
    labels[:, qs + nq: qs + 2 * nq] = a_toks
    return {"tokens": ids, "labels": labels, "modality_masks": mod,
            "question_mask": qm}


def run_variant(variant: str, scale: str = "tiny", seed: int = 0,
                steps: int | None = None) -> dict:
    import jax
    if scale == "tiny":  # tiny arms run op-by-op-slow on a tunneled chip
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp
    from moka_tpu.core.config import TrainConfig
    from moka_tpu.models import llama
    from moka_tpu.ops.moka import MokaSpec
    from moka_tpu.train.objectives import make_llama_moka_loss
    from moka_tpu.train.optim import make_optimizer
    from moka_tpu.train.step import init_train_state, make_train_step

    cfg = _config(scale)
    steps = steps or STEPS[scale]
    b, L = BATCH[scale], SEQLEN[scale]
    # dropout arms ("...drop" = reference-style independent per-projection
    # masks, "...dropsh" = one mask per distinct adapter input,
    # MokaSpec.dropout_shared_masks): anchor that the mask-sharing
    # throughput lever does not change convergence on the structured task
    full_name, drop = variant, None
    if variant.endswith("dropsh"):
        drop, variant = "shared", variant[:-6]
    elif variant.endswith("drop"):
        drop, variant = "indep", variant[:-4]
    spec = MokaSpec.avt(rank=4, dropout_rate=0.05 if drop else 0.0)
    if drop == "shared":
        spec = spec.with_shared_dropout_masks()
    if scale != "tiny":
        spec = spec.with_bf16_dots()

    k1, k2 = jax.random.split(jax.random.key(seed))
    # ALL variants quantize/keep the SAME bf16 tree: the only difference
    # between runs is the storage format of the frozen weights.
    base = llama.init_llama_params(k1, cfg, dtype=jnp.bfloat16)
    # int4a8 / int8a8: + per-token int8 activations on the base dots;
    # int4a8f / int8a8f: additionally int8-quantize the backward cotangent
    # so the dX dots also run on the MXU int8 path (quant.py bwd_a8="full")
    # trailing "qh": + int8-quantized frozen lm_head (the chunked-CE /
    # logits head dot reads the quantized head; llama.head_logits)
    head_bits = None
    # trailing "sq8": + int8-quantized remat save set (quant.q8_roundtrip)
    # under the flagship save policy — anchors the save_q8 forward noise
    sq8 = False
    vname = variant
    if vname.endswith("sq8"):
        sq8, vname = True, vname[:-3]
    if vname.endswith("qh"):
        head_bits, variant_core = 8, vname[:-2]
    else:
        variant_core = vname
    if variant_core.endswith("a8f"):
        a8, wq = "full", variant_core[:-3]
    elif variant_core.endswith("a8"):
        a8, wq = True, variant_core[:-2]
    else:
        a8, wq = False, variant_core
    if wq in ("int8", "int4"):
        from moka_tpu.ops.quant import quantize_llama_base
        frozen = quantize_llama_base(base, bits=int(wq[3:]),
                                     head_bits=head_bits)
        del base
    elif wq == "bf16":
        frozen = base
    else:
        raise ValueError(variant)
    trainable = {"adapters": llama.init_moka_adapters(k2, cfg, spec)}

    tcfg = TrainConfig(learning_rate=1e-3, warmup_ratio=0.05)
    tx = make_optimizer(tcfg, total_steps=steps)
    state = init_train_state(trainable, tx, jax.random.key(seed))
    loss_fn = make_llama_moka_loss(
        cfg, spec, remat=(scale != "tiny"),
        use_flash=(scale != "tiny"), fused_loss=(scale != "tiny"),
        remat_policy=("proj_nokv_lse" if sq8 and scale != "tiny" else None),
        a8_dots=a8,
        save_q8=(True if scale != "tiny" else
                 ("q", "o", "down", "gate", "up")) if sq8 else False)
    step = make_train_step(loss_fn, tx, donate=False)
    # held-out eval runs with dropout INACTIVE (rng=None) so the dropout
    # arms compare converged quality, not a mask realization; rate-0 arms
    # are unchanged (their rng was never consumed)
    eval_loss = jax.jit(lambda t, f, bt: loss_fn(t, f, bt, None)[0])

    data_rng = np.random.default_rng(seed)          # same stream per variant
    held_rng = np.random.default_rng(10_000 + seed)  # never trained on
    held = [{k: jnp.asarray(v) for k, v in
             _make_batch(held_rng, b, L, cfg.vocab_size).items()}
            for _ in range(4)]

    curve = []
    for i in range(steps):
        batch = {k: jnp.asarray(v) for k, v in
                 _make_batch(data_rng, b, L, cfg.vocab_size).items()}
        state, metrics = step(state, frozen, batch)
        if i % EVAL_EVERY[scale] == 0 or i == steps - 1:
            curve.append((i, float(metrics["loss"])))
    heldout = float(np.mean([float(eval_loss(state.params, frozen, hb))
                             for hb in held]))
    return {"variant": full_name, "scale": scale, "seed": seed,
            "steps": steps, "batch": b, "seqlen": L,
            "train_curve": [(i, round(l, 4)) for i, l in curve],
            "final_train_loss": round(curve[-1][1], 4),
            "heldout_loss": round(heldout, 4)}


def _make_enc_batch(rng: np.random.Generator, b: int, L: int, vocab: int,
                    img: int, n_frames: int, n_aud: int, nq_v: int,
                    nq_a: int, audio_frames: int = 32):
    """Encoder-anchored task: the ANSWER is keyed to the VIDEO content.

    Each sample draws a class c in [0, 16); its frames show a sinusoidal
    pattern whose spatial frequency encodes c (plus per-sample phase noise),
    and the supervised answer is the single token ``vocab//2 + c`` repeated.
    Learning it requires class information to survive CLIP -> Q-Former ->
    splice -> LLaMA, so a tower-quantization arm that degrades features
    shows up directly in held-out loss.  Audio is noise (present so BEATs
    runs quantized in the loop)."""
    from moka_tpu.data import assembler as asm
    half = vocab // 2
    base_v = vocab - len(asm.SPECIAL_TOKENS)
    t2i = {t: base_v + i for i, t in enumerate(asm.SPECIAL_TOKENS)}
    nv, na = n_frames * nq_v, n_aud * nq_a
    classes = rng.integers(0, 16, b)
    samples = []
    for i in range(b):
        prefix = rng.integers(4, half, 8).tolist()
        q_toks = rng.integers(4, 20, 4).tolist()
        answer = [int(half + classes[i])] * 4
        ids = (prefix
               + [t2i["<video_start>"], t2i["<video>"], t2i["<video_end>"]]
               + [t2i["<audio_start>"], t2i["<audio>"], t2i["<audio_end>"]]
               + [t2i["<question_start>"]] + q_toks + [t2i["<question_end>"]]
               + answer)
        lab = [-100] * (len(ids) - len(answer)) + answer
        samples.append(asm.assemble_sample(
            np.asarray(ids), np.asarray(lab), t2i, pad_id=0,
            n_video_tokens=nv, n_audio_tokens=na))
    batch = asm.pad_batch(samples, pad_id=0, pad_to=L)
    yy, xx = np.mgrid[0:img, 0:img].astype(np.float32)
    video = np.zeros((b, n_frames, 3, img, img), np.float32)
    for i in range(b):
        freq = 0.15 + 0.12 * classes[i]          # class-coded frequency
        phase = rng.uniform(0, 2 * np.pi)        # per-sample nuisance
        pat = np.sin(freq * xx + phase) * np.cos(freq * yy - phase)
        video[i] = pat[None, None] + rng.standard_normal(
            (n_frames, 3, img, img)).astype(np.float32) * 0.1
    batch["video"] = video
    batch["audio"] = rng.standard_normal(
        (b, n_aud, audio_frames, 128)).astype(np.float32)
    return batch


def run_encoder_variant(variant: str, scale: str = "tiny", seed: int = 0,
                        steps: int | None = None) -> dict:
    """encbf16 / enc8 / enc4: frozen-tower precision arms over the SAME
    flagship-quantized base (int4 + a8f + int8 head at 1b; plain int8 base
    at tiny where a8 overhead isn't worth the CPU time)."""
    import jax
    import jax.numpy as jnp
    from moka_tpu.core.config import LlamaConfig, TrainConfig
    from moka_tpu.models import unified
    from moka_tpu.models.beats import BeatsConfig
    from moka_tpu.models.clip_vit import ClipVitConfig
    from moka_tpu.models.projectors import ProjectorConfig
    from moka_tpu.ops.moka import MokaSpec
    from moka_tpu.ops.quant import quantize_encoder, quantize_llama_base
    from moka_tpu.train.optim import make_optimizer
    from moka_tpu.train.step import init_train_state, make_train_step

    if scale == "tiny":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    bits = {"encbf16": 0, "enc8": 8, "enc4": 4}[variant]
    steps = steps or STEPS[scale]
    spec = MokaSpec.avt(rank=4, dropout_rate=0.0)
    if scale == "tiny":
        ucfg = unified.UnifiedConfig.tiny(spec=spec)
        b, L, n_frames, n_aud, audio_frames = 4, 96, 2, 2, 32
        lr = 2e-3
    else:
        lcfg = _config("1b")
        spec = spec.with_bf16_dots()
        # REAL tower dims (CLIP ViT-L/14, BEATs AS2M) over the 1B base
        ucfg = unified.UnifiedConfig(
            llama=lcfg, clip=ClipVitConfig.vit_l_14(), beats=BeatsConfig(),
            vl_projector=ProjectorConfig.visual(d_model=lcfg.dim),
            al_projector=ProjectorConfig.audio(d_model=lcfg.dim),
            spec=spec, select_layers=(14, 23))
        b, L, n_frames, n_aud, audio_frames = 4, 256, 2, 2, 64
        lr = 1e-3

    k1, k2 = jax.random.split(jax.random.key(seed))
    dtype = jnp.float32 if scale == "tiny" else jnp.bfloat16
    frozen = unified.init_frozen(k1, ucfg, dtype=dtype)
    # base precision FIXED across arms; towers are the variable
    frozen["llama"] = quantize_llama_base(
        frozen["llama"], bits=8 if scale == "tiny" else 4,
        head_bits=None if scale == "tiny" else 8)
    if bits:
        frozen["clip"] = quantize_encoder(frozen["clip"], bits=bits,
                                          min_dim=16)
        frozen["beats"] = quantize_encoder(frozen["beats"], bits=bits,
                                           min_dim=16)
    trainable = unified.init_trainable(k2, ucfg)

    tcfg = TrainConfig(learning_rate=lr, warmup_ratio=0.05)
    tx = make_optimizer(tcfg, total_steps=steps)
    state = init_train_state(trainable, tx, jax.random.key(seed))
    loss_fn = unified.unified_loss(
        ucfg, remat=(scale != "tiny"), use_flash=(scale != "tiny"),
        fused_loss=(scale != "tiny"),
        a8_dots=("full" if scale != "tiny" else False))
    step = make_train_step(loss_fn, tx, donate=False)
    eval_loss = jax.jit(lambda t, f, bt: loss_fn(t, f, bt,
                                                 jax.random.key(1))[0])

    img, nq_v, nq_a = ucfg.clip.image_size, \
        ucfg.vl_projector.num_query_tokens, \
        ucfg.al_projector.num_query_tokens
    mk = lambda r: {k: jnp.asarray(v) for k, v in _make_enc_batch(
        r, b, L, ucfg.llama.vocab_size, img, n_frames, n_aud, nq_v, nq_a,
        audio_frames).items()}
    data_rng = np.random.default_rng(seed)
    held_rng = np.random.default_rng(10_000 + seed)
    held = [mk(held_rng) for _ in range(4)]

    curve = []
    for i in range(steps):
        state, metrics = step(state, frozen, mk(data_rng))
        if i % EVAL_EVERY[scale] == 0 or i == steps - 1:
            curve.append((i, float(metrics["loss"])))
    heldout = float(np.mean([float(eval_loss(state.params, frozen, hb))
                             for hb in held]))
    return {"variant": variant, "scale": scale, "seed": seed, "steps": steps,
            "batch": b, "seqlen": L,
            "train_curve": [(i, round(l, 4)) for i, l in curve],
            "final_train_loss": round(curve[-1][1], 4),
            "heldout_loss": round(heldout, 4)}


VARIANTS = ("bf16", "int8", "int4", "int4a8", "int8a8", "int4a8f",
            "int4a8fqh", "int4a8fqhsq8")
ENC_VARIANTS = ("encbf16", "enc8", "enc4")


def main(scale: str, seeds: int = 1, include_enc: bool = True):
    results: dict[str, list] = {}
    arms = VARIANTS + (ENC_VARIANTS if include_enc else ())
    for variant in arms:
        for seed in range(seeds):
            proc = subprocess.run(
                [sys.executable, __file__, "--one", variant, "--scale",
                 scale, "--seed", str(seed)],
                capture_output=True, text=True, timeout=3600)
            if proc.returncode != 0:
                print(f"# {variant} seed {seed} failed: "
                      f"{proc.stderr.strip()[-300:]}", file=sys.stderr)
                continue
            results.setdefault(variant, []).append(
                json.loads(proc.stdout.strip().splitlines()[-1]))
    print(json.dumps(results))

    def _stats(v):
        hs = [r["heldout_loss"] for r in results.get(v, [])]
        return (float(np.mean(hs)), float(np.std(hs))) if hs else (None,
                                                                   None)

    for ref_name, group in (("bf16", VARIANTS), ("encbf16", ENC_VARIANTS)):
        ref, ref_std = _stats(ref_name)
        if ref is None:
            continue
        print(f"# held-out loss ({len(results[ref_name])} seeds): "
              f"{ref_name}={ref:.4f}+/-{ref_std:.4f}", file=sys.stderr)
        for v in group:
            if v == ref_name or v not in results:
                continue
            h, s = _stats(v)
            print(f"#   {v}={h:.4f}+/-{s:.4f}  rel={(h - ref) / ref:+.2%}",
                  file=sys.stderr)


if __name__ == "__main__":
    args = sys.argv[1:]
    scale = args[args.index("--scale") + 1] if "--scale" in args else "tiny"
    seed = int(args[args.index("--seed") + 1]) if "--seed" in args else 0
    steps = int(args[args.index("--steps") + 1]) if "--steps" in args \
        else None
    if "--one" in args:
        variant = args[args.index("--one") + 1]
        fn = run_encoder_variant if variant.startswith("enc") else \
            run_variant
        print(json.dumps(fn(variant, scale, seed=seed, steps=steps)))
    else:
        seeds = int(args[args.index("--seeds") + 1]) if "--seeds" in args \
            else 1
        main(scale, seeds=seeds, include_enc="--no-enc" not in args)
