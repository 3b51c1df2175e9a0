"""Throughput benchmark: MokA fine-tune train-step tokens/sec/chip.

Mirrors the reference's fine-tune recipe (frozen LLaMA base in bf16, MokA
r=4x3 adapters on all 7 projections, grad checkpointing, AdamW on adapters
only — ``ft_musicavqa.sh:24-75``) on whatever single chip is present,
picking the largest model variant that fits.

Baseline: the reference publishes no tokens/sec (SURVEY.md §6).  We estimate
the A100 per-GPU throughput of its recipe from first principles: adapter-only
training costs ~6*P flops/token (2P forward + 2P remat + 2P dX backward; no
base weight grads), A100 bf16 peak 312 TFLOPs at a generous 35% MFU for the
DeepSpeed-offload + per-sample-python-loop pipeline -> ~2,600 tok/s/GPU for
7B.  vs_baseline = measured / (estimate scaled to the benched model size).
"""

import json
import sys
import time

import numpy as np


A100_PEAK_FLOPS = 312e12
A100_ASSUMED_MFU = 0.35


def _enable_compile_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/moka_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def run(cfg_name, cfg, batch, seqlen, use_flash=True, fused_loss=True,
        quantize=False, remat_policy=None, bf16_dots=False,
        fused_moka=False, rng_impl=None, ce_chunk=128,
        pallas_ce=False, ce_rows=False,
        dropout_rate=0.05, fwd_only=False, rank_attn=True,
        flash_rank_attn=False, question_window=None, a8_dots=False,
        quantize_head=False, save_q8=False, fused_dropout=False,
        shared_dropout=False):
    import jax
    _enable_compile_cache()
    import jax.numpy as jnp
    from moka_tpu.core.config import TrainConfig
    from moka_tpu.models import llama
    from moka_tpu.ops.moka import MokaSpec
    from moka_tpu.train.objectives import make_llama_moka_loss
    from moka_tpu.train.optim import make_optimizer
    from moka_tpu.train.step import init_train_state, make_train_step

    spec = MokaSpec.avt(rank=4, dropout_rate=dropout_rate)
    if not rank_attn:  # ablation probe: adapters without rank attention
        import dataclasses as _dc
        spec = _dc.replace(spec, attn_modalities=())
    if bf16_dots:
        spec = spec.with_bf16_dots()
    if flash_rank_attn:
        spec = spec.with_flash_rank_attn()
    if fused_dropout:
        spec = spec.with_fused_dropout()
    if shared_dropout:
        spec = spec.with_shared_dropout_masks()
    if question_window:
        # the bench question span is L//8 - 2 tokens (see mask below);
        # MUSIC-AVQA questions are far shorter than L/8 in practice
        spec = spec.with_question_window(question_window)
    r1, r2 = jax.random.split(jax.random.key(0))
    if quantize:
        # int8/int4 weight-only frozen base (QLoRA-style): the 7B flagship
        # fits one 16 GB v5e chip this way; init directly quantized (a
        # transient full-bf16 tree would OOM during setup).  quantize may be
        # True (int8) or the bit width itself.
        from moka_tpu.ops.quant import init_llama_params_quantized
        bits = 8 if quantize is True else int(quantize)
        frozen = init_llama_params_quantized(
            r1, cfg, bits=bits,
            head_bits=(8 if quantize_head is True else quantize_head or None))
    else:
        frozen = llama.init_llama_params(r1, cfg, dtype=jnp.bfloat16)
    trainable = {"adapters": llama.init_moka_adapters(r2, cfg, spec)}

    tx = make_optimizer(TrainConfig(), total_steps=1000)
    key = jax.random.key(0) if rng_impl is None else \
        jax.random.key(0, impl=rng_impl)
    state = init_train_state(trainable, tx, key)

    b, L = batch, seqlen
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

    loss_fn = make_llama_moka_loss(cfg, spec, remat=True,
                                   use_flash=use_flash,
                                   fused_loss=fused_loss,
                                   remat_policy=remat_policy,
                                   use_fused_moka=fused_moka,
                                   ce_chunk=ce_chunk, a8_dots=a8_dots,
                                   pallas_ce=pallas_ce, ce_rows=ce_rows,
                                   save_q8=save_q8)
    step = make_train_step(loss_fn, tx, donate=True)
    if fwd_only:  # ablation probe: loss evaluation without backward
        fwd = jax.jit(lambda s, f, b: loss_fn(s.params, f, b,
                                              jax.random.key(1))[0])

        def step(state, frozen, batch):  # noqa: same timing harness
            return state, {"loss": fwd(state, frozen, batch)}

    # warmup (compile) + 2 steps
    for _ in range(3):
        state, m = step(state, frozen, batch_d)
    float(m["loss"])

    # min over three pipelined 4-step windows (timeit-style): the tunneled
    # chip occasionally degrades for seconds at a time (measured 52 s/step
    # transients on an otherwise 1.2 s/step config); one long mean would
    # report the outage, the best window reports the machine.  Steps inside
    # a window stay async-dispatched so no per-step RTT is added.  The sync
    # is a device_get of the loss — block_until_ready returned early on the
    # tunneled chip (r3: measured 1.7 ms "steps" vs 1.4 s synchronous).
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            state, m = step(state, frozen, batch_d)
        float(m["loss"])
        windows.append((time.perf_counter() - t0) / 4)
    dt = min(windows)

    # sustained window (>=60 steps, one continuous async-dispatched stretch):
    # the best-of-3 short windows report the machine through tunnel
    # transients; this one reports what a long training run would sustain.
    t0 = time.perf_counter()
    for _ in range(60):
        state, m = step(state, frozen, batch_d)
    float(m["loss"])
    dt_sustained = (time.perf_counter() - t0) / 60

    tokens_per_sec = b * L / dt
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(frozen)
                   if x.dtype != np.float32 or x.ndim > 1)
    if quantize:  # count quantized weights once, not their fp32 scales
        n_params = sum(
            int(np.prod(x.shape)) * (2 if x.dtype == np.uint8 else 1)
            for x in jax.tree.leaves(frozen)
            if x.ndim >= 2 and "float32" not in str(x.dtype))
    flops_per_token = 6 * n_params
    device = jax.devices()[0]
    return {
        "config": cfg_name,
        "params": n_params,
        "batch": b, "seqlen": L,
        "step_time_s": dt,
        "tokens_per_sec": tokens_per_sec,
        "sustained_step_time_s": dt_sustained,
        "sustained_tokens_per_sec": b * L / dt_sustained,
        "sustained_steps": 60,
        "model_flops_per_sec": tokens_per_sec * flops_per_token,
        "device": str(device),
        "use_flash": use_flash, "fused_loss": fused_loss,
        "quantized_base": quantize, "remat_policy": remat_policy,
        "bf16_dots": bf16_dots, "fused_moka": fused_moka,
        "rng_impl": rng_impl, "question_window": question_window,
        "a8_dots": a8_dots, "quantized_head": quantize_head,
        "save_q8": save_q8, "shared_dropout": shared_dropout,
    }


def run_multimodal(cfg_name, ucfg, batch, seqlen, quantize,
                   remat_policy=None, n_video_groups=10, n_audio_groups=10,
                   audio_frames=192, rng_impl="rbg", a8_dots=False,
                   quantize_head=False, quantize_encoders=False,
                   save_q8=False):
    """FULL multimodal fine-tune step at flagship scale: CLIP ViT-L/14 on
    ``n_video_groups`` frames + BEATs on ``n_audio_groups`` fbank segments
    (both frozen, forward every step), two trainable Q-Former projectors
    (fwd+bwd), the feature splice, and the MokA-LLaMA step — the cost the
    reference recipe actually pays per step (``ft_musicavqa.sh:24-75`` →
    ``unified_arch.py:103-348``; hot loops SURVEY §3.1).  The text-only
    flagship bench excludes the encoder/projector cost; this one doesn't.

    Token budget mirrors the recipe: 10 frames x 32 query tokens + 10 audio
    segments x 32 = 640 multimodal tokens, the rest text, padded to the
    static ``seqlen``."""
    import jax
    _enable_compile_cache()
    import jax.numpy as jnp
    from moka_tpu.core.config import TrainConfig
    from moka_tpu.data import assembler as asm
    from moka_tpu.models import llama as llama_mod
    from moka_tpu.models import unified
    from moka_tpu.models.beats import init_beats_params
    from moka_tpu.models.clip_vit import init_clip_params
    from moka_tpu.ops.quant import init_llama_params_quantized
    from moka_tpu.train.optim import make_optimizer
    from moka_tpu.train.step import init_train_state, make_train_step

    k1, k2, k3, k4 = jax.random.split(jax.random.key(0), 4)
    frozen = {
        "llama": init_llama_params_quantized(
            k1, ucfg.llama, bits=quantize,
            head_bits=(8 if quantize_head is True else quantize_head or None))
        if quantize else
        llama_mod.init_llama_params(k1, ucfg.llama, dtype=jnp.bfloat16),
        "clip": init_clip_params(k2, ucfg.clip, dtype=jnp.bfloat16),
        "beats": init_beats_params(k3, ucfg.beats, dtype=jnp.bfloat16),
    }
    if quantize_encoders:
        # the towers are exactly as frozen as the base
        # (multimodal_encoder.py:44,183-186) — same weight-only treatment
        from moka_tpu.ops.quant import quantize_encoder
        frozen["clip"] = quantize_encoder(frozen["clip"],
                                          bits=quantize_encoders)
        frozen["beats"] = quantize_encoder(frozen["beats"],
                                           bits=quantize_encoders)
    trainable = unified.init_trainable(k4, ucfg)

    b, L = batch, seqlen
    nq_v = ucfg.vl_projector.num_query_tokens
    nq_a = ucfg.al_projector.num_query_tokens
    nv, na = n_video_groups * nq_v, n_audio_groups * nq_a
    base = ucfg.llama.vocab_size - len(asm.SPECIAL_TOKENS)
    t2i = {t: base + i for i, t in enumerate(asm.SPECIAL_TOKENS)}
    rng = np.random.default_rng(0)
    samples = []
    for i in range(b):
        prefix = rng.integers(4, base, 16 + i).tolist()
        q_toks = rng.integers(4, base, 16).tolist()
        n_ans = max(
            1, L - (len(prefix) + 3 + nv + 3 + na + 2 + len(q_toks)) - 8 - i)
        answer = rng.integers(4, base, n_ans).tolist()
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
    batch_d = {k: jnp.asarray(v) for k, v in batch_d.items()}

    loss_fn = unified.unified_loss(ucfg, remat=True, use_flash=True,
                                   fused_loss=True,
                                   remat_policy=remat_policy,
                                   a8_dots=a8_dots, save_q8=save_q8)
    tx = make_optimizer(TrainConfig(), total_steps=1000)
    key = jax.random.key(0) if rng_impl is None else \
        jax.random.key(0, impl=rng_impl)
    state = init_train_state(trainable, tx, key)
    step = make_train_step(loss_fn, tx, donate=True)

    for _ in range(3):
        state, m = step(state, frozen, batch_d)
    float(m["loss"])
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            state, m = step(state, frozen, batch_d)
        # sync via device_get of the loss: on the tunneled chip
        # block_until_ready (even on the full output tree) returned before
        # the steps executed (1.7 ms "steps" vs the 1.4 s a synchronous
        # probe measures); fetching the scalar genuinely waits
        float(m["loss"])
        windows.append((time.perf_counter() - t0) / 4)
    dt = min(windows)

    # sustained window, same rationale as in run()
    t0 = time.perf_counter()
    for _ in range(60):
        state, m = step(state, frozen, batch_d)
    float(m["loss"])
    dt_sustained = (time.perf_counter() - t0) / 60

    def _count(tree, quantized=False):
        if quantized:
            return sum(int(np.prod(x.shape)) * (2 if x.dtype == np.uint8
                                                else 1)
                       for x in jax.tree.leaves(tree)
                       if x.ndim >= 2 and "float32" not in str(x.dtype))
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

    p_llama = _count(frozen["llama"], quantized=bool(quantize))
    p_clip = _count(frozen["clip"], quantized=bool(quantize_encoders))
    p_beats = _count(frozen["beats"], quantized=bool(quantize_encoders))
    p_proj = _count({k: v for k, v in trainable.items()
                     if k.endswith("projector")})
    # per-step flops: adapter-training LLaMA (6P: 2P fwd + 2P remat +
    # 2P dX bwd), frozen encoders forward-only (2P), projectors fwd+bwd (6P)
    clip_tokens = b * n_video_groups * (ucfg.clip.n_patches + 1)
    beats_tokens = b * n_audio_groups * \
        (audio_frames // ucfg.beats.input_patch_size) * \
        (128 // ucfg.beats.input_patch_size)
    proj_tokens = (b * n_video_groups * (nq_v + ucfg.clip.n_patches)
                   + b * n_audio_groups * (nq_a + beats_tokens
                                           // (b * n_audio_groups)))
    step_flops = (6 * p_llama * b * L + 2 * p_clip * clip_tokens
                  + 2 * p_beats * beats_tokens + 6 * p_proj * proj_tokens)
    tokens_per_sec = b * L / dt
    # physical-sanity guard: a v5e peaks at ~197 bf16 TFLOPs; a "measured"
    # rate beyond 2x peak means the timing harness failed to synchronize
    assert step_flops / dt < 4e14, (
        f"impossible rate {step_flops / dt:.3g} FLOP/s — timing desync")
    return {
        "config": cfg_name,
        "scope": "full multimodal step: CLIP+BEATs fwd, Q-Former projectors "
                 "fwd+bwd, splice, MokA-LLaMA fwd+bwd",
        "params_llama": p_llama, "params_clip": p_clip,
        "params_beats": p_beats, "params_projectors": p_proj,
        "batch": b, "seqlen": L,
        "n_video_frames": n_video_groups, "n_audio_segments": n_audio_groups,
        "multimodal_tokens": nv + na,
        "step_time_s": dt,
        "window_step_times_s": [round(w, 4) for w in windows],
        "tokens_per_sec": tokens_per_sec,
        "sustained_step_time_s": dt_sustained,
        "sustained_tokens_per_sec": b * L / dt_sustained,
        "sustained_steps": 60,
        "step_flops": step_flops,
        "model_flops_per_sec": step_flops / dt,
        "device": str(jax.devices()[0]),
        "quantized_base": quantize, "remat_policy": remat_policy,
        "rng_impl": rng_impl, "a8_dots": a8_dots,
        "quantized_head": quantize_head,
        "quantized_encoders": quantize_encoders,
    }


def _mm_candidates():
    """Flagship-scale full-multimodal configs, ordered by fit likelihood.
    The AVT stack (CLIP-L/14 + BEATs + dual Q-Formers) adds ~0.9 GB bf16 of
    frozen encoder weights + projector optimizer state over the text-only
    flagship, so the save-heaviest policy that fits may be one notch below
    the text-only one."""
    from moka_tpu.models.unified import UnifiedConfig
    cfg7b = UnifiedConfig.avt_7b()
    import dataclasses as _dc
    cfg7b = _dc.replace(
        cfg7b,
        spec=cfg7b.spec.with_bf16_dots().with_question_window(256))
    return {
        # proj_nokv_lse (the text-only flagship policy) OOMs here by ~1.9 GB
        # once the encoder weights + projector optimizer state are resident;
        # qkvod_lse measured 1.307 s/step (3,133 tok/s, ~73% eff. MFU, r3).
        # a8: int8 activations on the LLaMA projections (W4A8) — 3,828 tok/s
        # (~89% eff. MFU); "full" adds the int8 backward cotangent on the
        # dX dots — 4,388 tok/s; quality anchored by exp_quant_quality.py
        # alongside the weight-only bases
        # + int8 frozen encoders (weight-only): CLIP 303M + BEATs 90M drop
        # ~0.45 GB HBM and halve the encoder weight reads of the fwd pass
        # The shipping mm flagship (r5): tower W8A8 a8 dots (+1.2%) AND the
        # int8-quantized save set at the WIDEST policy (proj_lse): measured
        # 4,946/4,988 vs 4,870/4,917 at proj_nokv_lse and 4,653/4,717 at
        # qkvod_lse (the policy ladder sq8's freed memory climbs)
        "avt_7b_int4a8f_qh_qenc_ta8_sq8plse": (
            _dc.replace(cfg7b,
                        clip=_dc.replace(cfg7b.clip, a8_dots=True),
                        beats=_dc.replace(cfg7b.beats, a8_dots=True)),
            4, 1024, 4, "proj_lse", "full", 8, 8, True),
        # sq8 at proj_nokv_lse (the first sq8 win) and the
        # int8-quantized remat save set, whose ~3 GB of freed residuals
        # re-admit the text-flagship proj_nokv_lse policy (OOMs by ~1.9 GB
        # here without it) — no gate/up or flash-fwd recompute in backward.
        # Measured 4,870/4,917 vs 4,653/4,717 at qkvod_lse (+4.7%/+4.2%);
        # sq8 at qkvod_lse without the policy switch is neutral (4,629),
        # i.e. the win is the policy upgrade the freed memory buys.
        "avt_7b_int4a8f_qh_qenc_ta8_sq8pnl": (
            _dc.replace(cfg7b,
                        clip=_dc.replace(cfg7b.clip, a8_dots=True),
                        beats=_dc.replace(cfg7b.beats, a8_dots=True)),
            4, 1024, 4, "proj_nokv_lse", "full", 8, 8, True),
        # tower a8 dots alone (no sq8): the r5 pre-sq8 best
        "avt_7b_int4a8f_qh_qenc_ta8": (
            _dc.replace(cfg7b,
                        clip=_dc.replace(cfg7b.clip, a8_dots=True),
                        beats=_dc.replace(cfg7b.beats, a8_dots=True)),
            4, 1024, 4, "qkvod_lse", "full", 8, 8),
        "avt_7b_int4a8f_qh_qenc_ta8_sq8": (
            _dc.replace(cfg7b,
                        clip=_dc.replace(cfg7b.clip, a8_dots=True),
                        beats=_dc.replace(cfg7b.beats, a8_dots=True)),
            4, 1024, 4, "qkvod_lse", "full", 8, 8, True),
        "avt_7b_int4a8f_qh_qenc": (cfg7b, 4, 1024, 4, "qkvod_lse", "full",
                                   8, 8),
        # + flash attention in the CLIP tower (scores stay in VMEM instead
        # of ~169 MB/layer fp32 HBM round trips at 40x257 tokens)
        "avt_7b_int4a8f_qh_qenc_ta8f": (
            _dc.replace(cfg7b,
                        clip=_dc.replace(cfg7b.clip, a8_dots=True,
                                         use_flash=True),
                        beats=_dc.replace(cfg7b.beats, a8_dots=True)),
            4, 1024, 4, "qkvod_lse", "full", 8, 8),
        "avt_7b_int4a8f_qh": (cfg7b, 4, 1024, 4, "qkvod_lse", "full", 8),
        "avt_7b_int4a8f_qkvod_lse": (cfg7b, 4, 1024, 4, "qkvod_lse",
                                     "full"),
        "avt_7b_int4a8_qkvod_lse": (cfg7b, 4, 1024, 4, "qkvod_lse", True),
        "avt_7b_int4_qkvod_lse": (cfg7b, 4, 1024, 4, "qkvod_lse", False),
        "avt_7b_int8": (cfg7b, 4, 1024, 8, "qkvod_lse", False),
        # the 7B SERVING stack (bench_decode --engine-mm): int8 base +
        # int8 head + int8 towers; decode rides int8-KV + paged
        "avt_7b_int8_qenc": (cfg7b, 4, 1024, 8, "qkvod_lse", False, 8, 8),
        "avt_7b_int4_fullremat": (cfg7b, 4, 1024, 4, None, False),
    }


def run_one_mm(name: str) -> None:
    v = _mm_candidates()[name]
    ucfg, b, L, quant, pol, a8 = v[:6]
    qh = v[6] if len(v) > 6 else False
    qe = v[7] if len(v) > 7 else False
    sq8 = v[8] if len(v) > 8 else False
    print(json.dumps(run_multimodal(name, ucfg, b, L, quant,
                                    remat_policy=pol, a8_dots=a8,
                                    quantize_head=qh,
                                    quantize_encoders=qe, save_q8=sq8)))


def run_vt(cfg_name, vcfg, batch, seqlen, quantize, remat_policy=None,
           a8_dots=False, quantize_head=False, quantize_encoders=False,
           rng_impl="rbg", save_q8=False):
    """FULL VT (bi-modal image/text, LLaVA-family) fine-tune step at
    flagship scale: CLIP ViT-L/14 forward (frozen), the trainable visual
    projector fwd+bwd, the feature splice, and the MokA-VT LLaMA step —
    the step the reference's VisualText recipe pays
    (``VisualText``: LLaVA + modified-peft MokA ``Linear``; hot loop
    SURVEY §3.1).  Mirrors ``run_multimodal`` minus the audio tower."""
    import jax
    _enable_compile_cache()
    import jax.numpy as jnp
    from moka_tpu.core.config import TrainConfig
    from moka_tpu.data.vt_dataset import build_vt_sample, collate_vt
    from moka_tpu.models import llama as llama_mod
    from moka_tpu.models import llava
    from moka_tpu.models.clip_vit import init_clip_params
    from moka_tpu.ops.quant import init_llama_params_quantized
    from moka_tpu.train.optim import make_optimizer
    from moka_tpu.train.step import init_train_state, make_train_step

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    frozen = {
        "llama": init_llama_params_quantized(
            k1, vcfg.llama, bits=quantize,
            head_bits=(8 if quantize_head is True else quantize_head or None))
        if quantize else
        llama_mod.init_llama_params(k1, vcfg.llama, dtype=jnp.bfloat16),
        "clip": init_clip_params(k2, vcfg.clip, dtype=jnp.bfloat16),
    }
    if quantize_encoders:
        from moka_tpu.ops.quant import quantize_encoder
        frozen["clip"] = quantize_encoder(frozen["clip"],
                                          bits=quantize_encoders)
    trainable = llava.init_trainable(k3, vcfg)

    b, L = batch, seqlen
    nq = vcfg.projector.num_query_tokens
    ph, pad = vcfg.llama.vocab_size - 1, 0
    rng = np.random.default_rng(0)
    samples = []
    for i in range(b):
        pre = rng.integers(4, 1000, 16 + i).tolist()
        q = rng.integers(4, 1000, 32).tolist()
        n_ans = L - (len(pre) + nq + len(q)) - 8 - i
        ans = rng.integers(4, 1000, n_ans).tolist()
        ids = np.asarray(pre + [ph] * nq + q + ans)
        labels = np.asarray([-100] * (len(pre) + nq + len(q)) + ans)
        samples.append(build_vt_sample(ids, labels, ph, pad,
                                       num_image_tokens=nq))
    batch_d = collate_vt(samples, pad_id=pad, pad_to=L)
    img = vcfg.clip.image_size
    batch_d["pixel_values"] = rng.standard_normal(
        (b, 3, img, img)).astype(np.float32)
    batch_d = {k: jnp.asarray(v) for k, v in batch_d.items()}

    loss_fn = llava.llava_loss(vcfg, remat=True, use_flash=True,
                               fused_loss=True, remat_policy=remat_policy,
                               a8_dots=a8_dots, save_q8=save_q8)
    tx = make_optimizer(TrainConfig(), total_steps=1000)
    key = jax.random.key(0) if rng_impl is None else \
        jax.random.key(0, impl=rng_impl)
    state = init_train_state(trainable, tx, key)
    step = make_train_step(loss_fn, tx, donate=True)

    for _ in range(3):
        state, m = step(state, frozen, batch_d)
    float(m["loss"])
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            state, m = step(state, frozen, batch_d)
        float(m["loss"])  # sync (see run_multimodal)
        windows.append((time.perf_counter() - t0) / 4)
    dt = min(windows)
    t0 = time.perf_counter()
    for _ in range(60):
        state, m = step(state, frozen, batch_d)
    float(m["loss"])
    dt_sustained = (time.perf_counter() - t0) / 60

    def _count(tree, quantized=False):
        if quantized:
            return sum(int(np.prod(x.shape)) * (2 if x.dtype == np.uint8
                                                else 1)
                       for x in jax.tree.leaves(tree)
                       if x.ndim >= 2 and "float32" not in str(x.dtype))
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

    p_llama = _count(frozen["llama"], quantized=bool(quantize))
    p_clip = _count(frozen["clip"], quantized=bool(quantize_encoders))
    p_proj = _count(trainable["projector"])
    clip_tokens = b * (vcfg.clip.n_patches + 1)
    proj_tokens = b * (nq + vcfg.clip.n_patches)
    step_flops = (6 * p_llama * b * L + 2 * p_clip * clip_tokens
                  + 6 * p_proj * proj_tokens)
    assert step_flops / dt < 4e14, (
        f"impossible rate {step_flops / dt:.3g} FLOP/s — timing desync")
    return {
        "config": cfg_name,
        "scope": "full VT step: CLIP fwd, projector fwd+bwd, splice, "
                 "MokA-VT LLaMA fwd+bwd",
        "params_llama": p_llama, "params_clip": p_clip,
        "params_projector": p_proj,
        "batch": b, "seqlen": L, "image_tokens": nq,
        "step_time_s": dt,
        "window_step_times_s": [round(w, 4) for w in windows],
        "tokens_per_sec": b * L / dt,
        "sustained_step_time_s": dt_sustained,
        "sustained_tokens_per_sec": b * L / dt_sustained,
        "sustained_steps": 60,
        "step_flops": step_flops,
        "model_flops_per_sec": step_flops / dt,
        "device": str(jax.devices()[0]),
        "quantized_base": quantize, "remat_policy": remat_policy,
        "a8_dots": a8_dots, "quantized_head": quantize_head,
        "quantized_encoders": quantize_encoders,
    }


def _vt_candidates():
    from moka_tpu.models import llava
    import dataclasses as _dc
    cfg = llava.LlavaConfig.vt_7b()
    cfg = _dc.replace(cfg, spec=cfg.spec.with_bf16_dots())
    return {
        # one tower (CLIP) instead of two: the text-only flagship policy
        # (proj_nokv_lse) fits again, unlike the AVT multimodal step
        # The shipping VT flagship (r5): int8-quantized save set at the
        # widest policy: 5,196/5,243 vs 4,988/5,075 (sq8 @ proj_nokv_lse)
        # vs 4,835/4,873 (bf16 saves) — +7.5% total
        "vt_7b_int4a8f_qh_qenc_sq8plse": (cfg, 4, 1024, 4, "proj_lse",
                                          "full", 8, 8, True),
        # sq8 at proj_nokv_lse: the intermediate rung.
        # Unlike the text step (sq8 neutral there), the tower-resident VT
        # step is memory-pressured enough that the ~3 GB of freed residuals
        # buy real scheduling room: 4,988/5,075 vs 4,835/4,873 (+3.2/+4.1%)
        "vt_7b_int4a8f_qh_qenc_sq8": (cfg, 4, 1024, 4, "proj_nokv_lse",
                                      "full", 8, 8, True),
        "vt_7b_int4a8f_qh_qenc": (cfg, 4, 1024, 4, "proj_nokv_lse", "full",
                                  8, 8),
        "vt_7b_int4a8f_qh": (cfg, 4, 1024, 4, "proj_nokv_lse", "full", 8),
        "vt_7b_int4": (cfg, 4, 1024, 4, "qkvod_lse", False),
        "vt_7b_int8": (cfg, 4, 1024, 8, "qkvod_lse", False),
    }


def run_one_vt(name: str) -> None:
    v = _vt_candidates()[name]
    vcfg, b, L, quant, pol, a8 = v[:6]
    qh = v[6] if len(v) > 6 else False
    qe = v[7] if len(v) > 7 else False
    sq8 = v[8] if len(v) > 8 else False
    print(json.dumps(run_vt(name, vcfg, b, L, quant, remat_policy=pol,
                            a8_dots=a8, quantize_head=qh,
                            quantize_encoders=qe, save_q8=sq8)))


def _candidates():
    # Ordered by likelihood of fitting one v5e chip (16 GB): the 7B-int8
    # flagship runs with the round-2 tuned recipe (qkvod remat policy =
    # save the narrow projection outputs, bf16-in/fp32-acc adapter einsums,
    # rbg dropout PRNG); 7B bf16 runs FSDP-sharded on >=2 chips.
    import dataclasses as _dc
    from moka_tpu.core.config import LlamaConfig
    return {
        # flagship: int4-packed frozen base frees HBM for the proj_nokv_lse
        # save policy (no gate/up matmul or flash-fwd recompute in backward);
        # question_window=128 bounds the rank-attention keys to the
        # (contiguous) question span (bench span: 126 tokens; real MUSIC-AVQA
        # questions are far shorter).  kq=128 and 256 measured within noise
        # of each other (+3.3%); 256 ships as the safer bound
        # W4A8: + dynamic per-token int8 activations on the frozen-base dots
        # (the MXU int8 path is ~2x the bf16 rate); measured 3,775 -> 4,318
        # tok/s.  "full" also quantizes the backward cotangent so the dX
        # dots ride the int8 path: 4,318 -> 5,023 (SwitchBack-style, dX
        # only — weights are frozen, no dW exists).  Quality anchored by
        # exp_quant_quality.py (a8 + a8f arms).
        # + int8-quantized frozen lm_head: the chunked-CE scan re-reads the
        # bf16 head ~3x per chunk per step (measured bandwidth-saturated,
        # 2,608 GB/s); int8 halves the bytes and the a8 path runs the chunk
        # dots int8 x int8 on the MXU.
        # The shipping text flagship (r5): int8-quantized remat save set
        # (save_q8) + the widest save policy (proj_lse: all 7 projection
        # outputs + flash residuals — zero projection recompute in
        # backward), which only fits beside the int4 base BECAUSE the
        # residuals are int8.  Measured 5,413.7/5,460.7 vs 5,325.5/5,371.6
        # at proj_nokv_lse (+1.7%) — crosses 2.0x vs the A100 estimate.
        "llama2_7b_int4a8_qh_sq8_plse": (
            LlamaConfig.llama2_7b(vocab_size=32011), 4, 1024, 4,
            "proj_lse", True, "rbg", 256, "full", 8, True),
        # Shared dropout masks (`MokaSpec.dropout_shared_masks`, r5 second
        # session): one LoRA-dropout mask per DISTINCT adapter input (q/k/v
        # share the attn-norm output, gate/up the mlp-norm output) so XLA
        # CSE collapses the identical bits+mask chains 7 -> 4 per layer.
        # A dropout-off A/B showed the chain costs ~50 ms/step NOT hidden
        # by the scheduler (5,800 vs 5,415 tok/s); sharing recovers ~half:
        # measured 5,536.8/5,601.8 (+2.2%/+2.5%).  Exact per-element
        # Bernoulli(keep) semantics, but the 1B convergence anchor
        # (drop/dropsh arms) measures a CONSISTENT +0.6% mean held-out
        # penalty (3/3 seeds) from the lost cross-projection mask
        # independence — below this repo's promotion bar, so the lever
        # ships as a measured OPT-IN (--shared-dropout-masks), not the
        # flagship (PERFORMANCE.md r5 second session)
        "llama2_7b_int4a8_qh_sq8_plse_shd": (
            LlamaConfig.llama2_7b(vocab_size=32011), 4, 1024, 4,
            "proj_lse", True, "rbg", 256, "full", 8, True, True),
        "llama2_7b_int4a8_qh": (LlamaConfig.llama2_7b(vocab_size=32011), 4,
                                1024, 4, "proj_nokv_lse", True, "rbg", 256,
                                "full", 8),
        # sq8: remat save set stored as per-token int8 (quant.q8_roundtrip)
        # — halves the residual bytes of the policy's 5 saved projections
        # (~2.9 GB at b4xL1024); measured vs the flagship same-day (r5)
        "llama2_7b_int4a8_qh_sq8": (
            LlamaConfig.llama2_7b(vocab_size=32011), 4, 1024, 4,
            "proj_nokv_lse", True, "rbg", 256, "full", 8, True),
        # the freed residual memory re-spent on batch: b6 fits with sq8
        "llama2_7b_int4a8_qh_sq8_b6": (
            LlamaConfig.llama2_7b(vocab_size=32011), 6, 1024, 4,
            "proj_nokv_lse", True, "rbg", 256, "full", 8, True),
        # gate/up only (explicit tuple): ~60% of the byte win with 4 extra
        # scan residuals instead of 10 (compile-time/fusion tradeoff probe)
        "llama2_7b_int4a8_qh_sq8gu": (
            LlamaConfig.llama2_7b(vocab_size=32011), 4, 1024, 4,
            "proj_nokv_lse", True, "rbg", 256, "full", 8, ("gate", "up")),
        # fp8-e4m3 saves: single convert, no abs-max reduction or scales
        "llama2_7b_int4a8_qh_sfp8": (
            LlamaConfig.llama2_7b(vocab_size=32011), 4, 1024, 4,
            "proj_nokv_lse", True, "rbg", 256, "full", 8, "fp8"),
        "llama2_7b_int4a8": (LlamaConfig.llama2_7b(vocab_size=32011), 4,
                             1024, 4, "proj_nokv_lse", True, "rbg", 256,
                             "full"),
        "llama2_7b_int4a8_ste": (LlamaConfig.llama2_7b(vocab_size=32011), 4,
                                 1024, 4, "proj_nokv_lse", True, "rbg", 256,
                                 True),
        "llama2_7b_int4": (LlamaConfig.llama2_7b(vocab_size=32011), 4, 1024,
                           4, "proj_nokv_lse", True, "rbg", 256),
        # long-context rows (VERDICT r4 weak 4): flagship recipe at L=4096
        # with dynamic-NTK RoPE scaling active (seq > max_seq_len=2048 —
        # reference modeling_llama.py:128-178), flash + question-window +
        # assembler-shaped masks all exercised at 4k
        "llama2_7b_int4a8_qh_L4096": (
            _dc.replace(LlamaConfig.llama2_7b(vocab_size=32011),
                        rope_scaling=("dynamic", 2.0)), 1,
            4096, 4, "proj_nokv_lse", True, "rbg", 256, "full", 8),
        # b2 doubles the save-set tokens vs the flagship: qkvod_lse OOMs by
        # 1.95 GB, full remat (save only layer inputs) fits
        "llama2_7b_int4a8_qh_b2L4096": (
            _dc.replace(LlamaConfig.llama2_7b(vocab_size=32011),
                        rope_scaling=("dynamic", 2.0)), 2,
            4096, 4, None, True, "rbg", 256, "full", 8),
        # sq8 long-context arms (r5): int8 residuals halve the 4k-token
        # save set — the b1 arm upgrades to the widest policy, the b2 arm
        # re-admits a projection-saving policy where only full remat fit
        "llama2_7b_int4a8_qh_sq8_plse_L4096": (
            _dc.replace(LlamaConfig.llama2_7b(vocab_size=32011),
                        rope_scaling=("dynamic", 2.0)), 1,
            4096, 4, "proj_lse", True, "rbg", 256, "full", 8, True),
        "llama2_7b_int4a8_qh_sq8_b2L4096": (
            _dc.replace(LlamaConfig.llama2_7b(vocab_size=32011),
                        rope_scaling=("dynamic", 2.0)), 2,
            4096, 4, "qkvod_lse", True, "rbg", 256, "full", 8, True),
        "llama2_7b_int8": (LlamaConfig.llama2_7b(vocab_size=32011), 4, 1024,
                           True, "qkvod_lse", True, "rbg", 256),
        "llama2_7b_int8_fullremat": (
            LlamaConfig.llama2_7b(vocab_size=32011), 4, 1024, True, None,
            True, "rbg", 0),
        "llama_3b": (LlamaConfig(vocab_size=32011, dim=2560, n_layers=26,
                                 n_heads=20, n_kv_heads=20,
                                 intermediate=6912), 4, 1024, False, "qkvod",
                     True, "rbg", 0),
        "llama_1b": (LlamaConfig(vocab_size=32011, dim=2048, n_layers=16,
                                 n_heads=16, n_kv_heads=16,
                                 intermediate=5504), 8, 1024, False, "qkvod",
                     True, "rbg", 0),
    }


def run_one(name: str) -> None:
    v = _candidates()[name]
    cfg, b, L, quant, pol, bf16, rng_impl, qw = v[:8]
    a8 = v[8] if len(v) > 8 else False
    qh = v[9] if len(v) > 9 else False
    sq8 = v[10] if len(v) > 10 else False
    shd = v[11] if len(v) > 11 else False
    print(json.dumps(run(name, cfg, b, L, quantize=quant, remat_policy=pol,
                         bf16_dots=bf16, rng_impl=rng_impl,
                         question_window=qw or None, a8_dots=a8,
                         quantize_head=qh, save_q8=sq8,
                         shared_dropout=shd)))


def main():
    # Each candidate runs in a fresh subprocess: a failed (OOM) attempt must
    # not leak device buffers into the next one.
    import subprocess

    result = None
    for name in _candidates():
        proc = subprocess.run(
            [sys.executable, __file__, "--run-one", name],
            capture_output=True, text=True, timeout=1200)
        if proc.returncode == 0 and proc.stdout.strip():
            try:
                result = json.loads(proc.stdout.strip().splitlines()[-1])
                break
            except json.JSONDecodeError:
                pass
        print(f"# bench config {name} failed: "
              f"{proc.stderr.strip().splitlines()[-1][:200] if proc.stderr else '?'}",
              file=sys.stderr)
    if result is None:
        print(json.dumps({"metric": "finetune_tokens_per_sec_per_chip",
                          "value": 0.0, "unit": "tokens/s",
                          "vs_baseline": 0.0, "error": "no config fit"}))
        return

    # A100 estimate for the same model size
    a100_tps = (A100_PEAK_FLOPS * A100_ASSUMED_MFU) / (6 * result["params"])
    out = {
        "metric": "finetune_tokens_per_sec_per_chip",
        "value": round(result["tokens_per_sec"], 2),
        "unit": "tokens/s",
        "vs_baseline": round(result["tokens_per_sec"] / a100_tps, 3),
        "scope": "text-only MokA-LLaMA step (no encoders/projectors)",
        "detail": result,
        "baseline_estimate_tokens_per_sec_a100": round(a100_tps, 1),
    }

    # FULL multimodal step (what the reference recipe pays per step):
    # reported alongside, never instead of, the text-only number.
    mm = None
    for name in _mm_candidates():
        proc = subprocess.run(
            [sys.executable, __file__, "--run-one-mm", name],
            capture_output=True, text=True, timeout=2400)
        if proc.returncode == 0 and proc.stdout.strip():
            try:
                mm = json.loads(proc.stdout.strip().splitlines()[-1])
                break
            except json.JSONDecodeError:
                pass
        print(f"# bench mm config {name} failed: "
              f"{proc.stderr.strip().splitlines()[-1][:200] if proc.stderr else '?'}",
              file=sys.stderr)
    if mm is not None:
        # A100 baseline pays the same encoders: scale peak*MFU by the
        # effective per-token flops of the full step.
        eff_flops_per_token = mm["step_flops"] / (mm["batch"] * mm["seqlen"])
        a100_mm = (A100_PEAK_FLOPS * A100_ASSUMED_MFU) / eff_flops_per_token
        out["multimodal"] = {
            "metric": "finetune_multimodal_tokens_per_sec_per_chip",
            "value": round(mm["tokens_per_sec"], 2),
            "unit": "tokens/s",
            "vs_baseline": round(mm["tokens_per_sec"] / a100_mm, 3),
            "detail": mm,
            "baseline_estimate_tokens_per_sec_a100": round(a100_mm, 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--run-one":
        run_one(sys.argv[2])
    elif len(sys.argv) > 2 and sys.argv[1] == "--run-one-mm":
        run_one_mm(sys.argv[2])
    elif len(sys.argv) > 2 and sys.argv[1] == "--run-one-vt":
        run_one_vt(sys.argv[2])
    else:
        main()
