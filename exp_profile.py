"""Profile the flagship train step on the real chip and print an op-level
time breakdown (fwd vs bwd attribution by fusion name / source metadata).

Usage:
    python exp_profile.py [config]          # default llama2_7b_int4
    python exp_profile.py --parse DIR       # re-parse an existing trace

Writes the jax.profiler trace under /tmp/moka_prof/<config>/ and aggregates
the Perfetto trace.json.gz device slices by op name.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def run_and_trace(name: str) -> str:
    import jax
    import bench

    v = bench._candidates()[name]
    cfg, b, L, quant, pol, bf16, rng_impl, qw = v[:8]
    a8 = v[8] if len(v) > 8 else False
    qh = v[9] if len(v) > 9 else False
    sq8 = v[10] if len(v) > 10 else False
    outdir = f"/tmp/moka_prof/{name}"
    os.makedirs(outdir, exist_ok=True)

    # reuse the bench harness up to the warmup, then trace 3 steps
    import numpy as np
    import jax.numpy as jnp
    from moka_tpu.core.config import TrainConfig
    from moka_tpu.models import llama
    from moka_tpu.ops.moka import MokaSpec
    from moka_tpu.train.objectives import make_llama_moka_loss
    from moka_tpu.train.optim import make_optimizer
    from moka_tpu.train.step import init_train_state, make_train_step

    bench._enable_compile_cache()
    spec = MokaSpec.avt(rank=4, dropout_rate=0.05)
    if bf16:
        spec = spec.with_bf16_dots()
    if qw:
        spec = spec.with_question_window(qw)
    r1, r2 = jax.random.split(jax.random.key(0))
    if quant:
        from moka_tpu.ops.quant import init_llama_params_quantized
        bits = 8 if quant is True else int(quant)
        frozen = init_llama_params_quantized(
            r1, cfg, bits=bits,
            head_bits=(8 if qh is True else qh or None))
    else:
        frozen = llama.init_llama_params(r1, cfg, dtype=jnp.bfloat16)
    trainable = {"adapters": llama.init_moka_adapters(r2, cfg, spec)}
    tx = make_optimizer(TrainConfig(), total_steps=1000)
    key = jax.random.key(0) if rng_impl is None else \
        jax.random.key(0, impl=rng_impl)
    state = init_train_state(trainable, tx, key)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(4, cfg.vocab_size, (b, L)), jnp.int32)
    labels = jnp.asarray(np.where(rng.random((b, L)) < 0.25, -100,
                                  np.asarray(toks)), jnp.int32)
    mod = np.zeros((3, b, L), np.float32)
    mod[0, :, : L // 2] = 1
    mod[1, :, L // 2: 3 * L // 4] = 1
    mod[2, :, 3 * L // 4:] = 1
    q = np.zeros((b, L), np.float32)
    q[:, 2: L // 8] = 1
    batch_d = {"tokens": toks, "labels": labels,
               "modality_masks": jnp.asarray(mod),
               "question_mask": jnp.asarray(q)}
    loss_fn = make_llama_moka_loss(cfg, spec, remat=True, use_flash=True,
                                   fused_loss=True, remat_policy=pol,
                                   a8_dots=a8, save_q8=sq8)
    step = make_train_step(loss_fn, tx, donate=True)
    for _ in range(2):
        state, m = step(state, frozen, batch_d)
    float(m["loss"])

    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, m = step(state, frozen, batch_d)
        float(m["loss"])
    return outdir


def run_and_trace_mm(name: str) -> str:
    """Trace the FULL multimodal step (CLIP+BEATs fwd, projectors fwd+bwd,
    splice, MokA-LLaMA fwd+bwd) — the bench.run_multimodal path — to
    attribute the text-only vs multimodal step-time delta (VERDICT r4
    item 4: the 4,626 vs 5,326 tok/s gap is the tower forward)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    import bench
    from moka_tpu.core.config import TrainConfig
    from moka_tpu.data import assembler as asm
    from moka_tpu.models import llama as llama_mod
    from moka_tpu.models import unified
    from moka_tpu.models.beats import init_beats_params
    from moka_tpu.models.clip_vit import init_clip_params
    from moka_tpu.train.optim import make_optimizer
    from moka_tpu.train.step import init_train_state, make_train_step

    bench._enable_compile_cache()
    v = bench._mm_candidates()[name]
    ucfg, b, L, quantize, pol, a8 = v[:6]
    qh = v[6] if len(v) > 6 else False
    qe = v[7] if len(v) > 7 else False
    outdir = f"/tmp/moka_prof/{name}"
    os.makedirs(outdir, exist_ok=True)

    k1, k2, k3, k4 = jax.random.split(jax.random.key(0), 4)
    if quantize:
        from moka_tpu.ops.quant import init_llama_params_quantized
        frozen = {"llama": init_llama_params_quantized(
            k1, ucfg.llama, bits=quantize,
            head_bits=(8 if qh is True else qh or None))}
    else:
        frozen = {"llama": llama_mod.init_llama_params(
            k1, ucfg.llama, dtype=jnp.bfloat16)}
    frozen["clip"] = init_clip_params(k2, ucfg.clip, dtype=jnp.bfloat16)
    frozen["beats"] = init_beats_params(k3, ucfg.beats, dtype=jnp.bfloat16)
    if qe:
        from moka_tpu.ops.quant import quantize_encoder
        frozen["clip"] = quantize_encoder(frozen["clip"], bits=qe)
        frozen["beats"] = quantize_encoder(frozen["beats"], bits=qe)
    trainable = unified.init_trainable(k4, ucfg)

    n_video_groups = n_audio_groups = 10
    audio_frames = 192
    nq_v = ucfg.vl_projector.num_query_tokens
    nq_a = ucfg.al_projector.num_query_tokens
    nv, na = n_video_groups * nq_v, n_audio_groups * nq_a
    vbase = ucfg.llama.vocab_size - len(asm.SPECIAL_TOKENS)
    t2i = {t: vbase + i for i, t in enumerate(asm.SPECIAL_TOKENS)}
    rng = np.random.default_rng(0)
    samples = []
    for i in range(b):
        prefix = rng.integers(4, vbase, 16 + i).tolist()
        q_toks = rng.integers(4, vbase, 16).tolist()
        n_ans = max(
            1, L - (len(prefix) + 3 + nv + 3 + na + 2 + len(q_toks)) - 8 - i)
        answer = rng.integers(4, vbase, n_ans).tolist()
        ids = (prefix
               + [t2i["<video_start>"], t2i["<video>"], t2i["<video_end>"]]
               + [t2i["<audio_start>"], t2i["<audio>"], t2i["<audio_end>"]]
               + [t2i["<question_start>"]] + q_toks
               + [t2i["<question_end>"]] + answer)
        lab = [-100] * (len(ids) - len(answer)) + answer
        samples.append(asm.assemble_sample(
            np.asarray(ids), np.asarray(lab), t2i, pad_id=0,
            n_video_tokens=nv, n_audio_tokens=na))
    batch_d = asm.pad_batch(samples, pad_id=0, pad_to=L)
    img = ucfg.clip.image_size
    batch_d["video"] = rng.standard_normal(
        (b, n_video_groups, 3, img, img)).astype(np.float32)
    batch_d["audio"] = rng.standard_normal(
        (b, n_audio_groups, audio_frames, 128)).astype(np.float32)
    batch_d = {k: jnp.asarray(x) for k, x in batch_d.items()}

    loss_fn = unified.unified_loss(ucfg, remat=True, use_flash=True,
                                   fused_loss=True, remat_policy=pol,
                                   a8_dots=a8)
    tx = make_optimizer(TrainConfig(), total_steps=1000)
    state = init_train_state(trainable, tx, jax.random.key(0, impl="rbg"))
    step = make_train_step(loss_fn, tx, donate=True)
    for _ in range(2):
        state, m = step(state, frozen, batch_d)
    float(m["loss"])
    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, m = step(state, frozen, batch_d)
        float(m["loss"])
    return outdir


def parse(outdir: str, top: int = 40):
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print(f"no trace under {outdir}", file=sys.stderr)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # pid -> process name; keep only TPU device threads (not host python)
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pnames.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] += dur
        cnt[name] += 1
        total += dur
    print(f"# trace {path}")
    print(f"# device pids: { {p: pnames[p] for p in dev_pids} }")
    print(f"# total device time {total:.1f} ms over 3 steps")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    for name, dur in rows:
        print(f"{dur:9.2f} ms  x{cnt[name]:<5} {name[:140]}")

    # ---- source-attributed table: ms + HBM bytes + flops per source line
    # (XLA device events carry args.source / bytes_accessed / model_flops;
    # while-loop bodies appear once per layer per step, so sums are true
    # per-trace totals).  GB/s of the top rows against the ~819 GB/s v5e
    # HBM bound identifies the bandwidth-bound blocks to attack.
    src_ms = defaultdict(float)
    src_bytes = defaultdict(float)
    src_flops = defaultdict(float)
    src_cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        a = e.get("args") or {}
        key = a.get("source")
        if not key:
            continue
        cat = a.get("hlo_category", "")
        key = f"{key} [{cat}]"
        src_ms[key] += e.get("dur", 0) / 1e3
        src_bytes[key] += float(a.get("bytes_accessed", 0) or 0)
        src_flops[key] += float(a.get("model_flops", 0) or 0)
        src_cnt[key] += 1
    print("\n# by source line (sum over the traced steps):")
    print(f"{'ms':>9}  {'GB/s':>6}  {'TF/s':>6}  x      source [category]")
    for key, ms in sorted(src_ms.items(), key=lambda kv: -kv[1])[:top]:
        gbps = src_bytes[key] / (ms * 1e6) if ms else 0.0
        tfps = src_flops[key] / (ms * 1e9) if ms else 0.0
        print(f"{ms:9.2f}  {gbps:6.0f}  {tfps:6.1f}  x{src_cnt[key]:<5} "
              f"{key[:120]}")


if __name__ == "__main__":
    if "--parse" in sys.argv:
        parse(sys.argv[sys.argv.index("--parse") + 1])
    elif "--mm" in sys.argv:
        pos = [a for a in sys.argv[1:] if not a.startswith("--")]
        name = pos[0] if pos else "avt_7b_int4a8f_qh_qenc"
        outdir = run_and_trace_mm(name)
        parse(outdir)
    else:
        name = sys.argv[1] if len(sys.argv) > 1 else "llama2_7b_int4"
        outdir = run_and_trace(name)
        parse(outdir)
