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
    python exp_quant_quality.py --one bf16|int8|int4 [--scale tiny|1b]
    python exp_quant_quality.py [--scale 1b]     # all three, summary table

Tiny scale runs on CPU (used by tests/test_quant_quality.py); 1b runs on the
chip (PERFORMANCE.md table).
"""

from __future__ import annotations

import json
import subprocess
import sys

import numpy as np

STEPS = {"tiny": 200, "1b": 60}
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
    spec = MokaSpec.avt(rank=4, dropout_rate=0.0)
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
    if variant.endswith("qh"):
        head_bits, variant_core = 8, variant[:-2]
    else:
        variant_core = variant
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
        remat_policy=None, a8_dots=a8)
    step = make_train_step(loss_fn, tx, donate=False)
    eval_loss = jax.jit(lambda t, f, bt: loss_fn(t, f, bt,
                                                 jax.random.key(1))[0])

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
    return {"variant": variant, "scale": scale, "seed": seed, "steps": steps,
            "batch": b, "seqlen": L,
            "train_curve": [(i, round(l, 4)) for i, l in curve],
            "final_train_loss": round(curve[-1][1], 4),
            "heldout_loss": round(heldout, 4)}


def main(scale: str):
    results = {}
    for variant in ("bf16", "int8", "int4", "int4a8", "int8a8", "int4a8f",
                    "int4a8fqh"):
        proc = subprocess.run(
            [sys.executable, __file__, "--one", variant, "--scale", scale],
            capture_output=True, text=True, timeout=3600)
        if proc.returncode != 0:
            print(f"# {variant} failed: {proc.stderr.strip()[-300:]}",
                  file=sys.stderr)
            continue
        results[variant] = json.loads(proc.stdout.strip().splitlines()[-1])
    print(json.dumps(results))
    if "bf16" in results:
        ref = results["bf16"]["heldout_loss"]
        print(f"# held-out loss: bf16={ref:.4f}", file=sys.stderr)
        for v in ("int8", "int4", "int4a8", "int8a8", "int4a8f",
                  "int4a8fqh"):
            if v in results:
                h = results[v]["heldout_loss"]
                print(f"#   {v}={h:.4f}  rel={(h - ref) / ref:+.2%}",
                      file=sys.stderr)


if __name__ == "__main__":
    args = sys.argv[1:]
    scale = args[args.index("--scale") + 1] if "--scale" in args else "tiny"
    if "--one" in args:
        out = run_variant(args[args.index("--one") + 1], scale)
        print(json.dumps(out))
    else:
        main(scale)
