"""Int8 weight-only quantized base: quantization error bounds, forward
closeness, and adapter training on a quantized base."""

import numpy as np
import jax
import jax.numpy as jnp

from moka_tpu.core.config import LlamaConfig, TrainConfig
from moka_tpu.models import llama
from moka_tpu.ops.moka import MokaSpec
from moka_tpu.ops.quant import (dequantize, quantize_int8,
                                quantize_llama_base, quantized_bytes)
from moka_tpu.train.objectives import make_llama_moka_loss
from moka_tpu.train.optim import make_optimizer
from moka_tpu.train.step import init_train_state, make_train_step

CFG = LlamaConfig.tiny(vocab_size=64)
SPEC = MokaSpec.avt(rank=4, dropout_rate=0.0)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 16, 8)) * 0.05, jnp.float32)
    qw = quantize_int8(w)
    back = dequantize(qw, dtype=jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w)).max()
    # per-channel symmetric int8: max error <= scale/2 = max|w|/254
    assert err <= float(np.abs(np.asarray(w)).max()) / 127 + 1e-7


def test_quantized_base_forward_close_and_smaller():
    base = llama.init_llama_params(jax.random.key(0), CFG, dtype=jnp.float32)
    qbase = quantize_llama_base(base)
    assert quantized_bytes(qbase) < 0.55 * quantized_bytes(base)

    toks = jnp.arange(32).reshape(2, 16) % 64
    full, _ = llama.forward(base, CFG, tokens=toks)
    quant, _ = llama.forward(qbase, CFG, tokens=toks)
    # logits close in distribution: top-1 agreement on most positions
    agree = np.mean(np.asarray(jnp.argmax(full, -1) == jnp.argmax(quant, -1)))
    assert agree > 0.9, agree
    rel = float(jnp.abs(full - quant).mean() / jnp.abs(full).mean())
    assert rel < 0.05, rel


def test_adapter_training_on_quantized_base():
    rng = np.random.default_rng(0)
    base = llama.init_llama_params(jax.random.key(1), CFG, dtype=jnp.float32)
    qbase = quantize_llama_base(base)
    trainable = {"adapters": llama.init_moka_adapters(jax.random.key(2),
                                                      CFG, SPEC)}
    toks = jnp.asarray(rng.integers(4, 64, (2, 16)), jnp.int32)
    batch = {"tokens": toks, "labels": toks}
    tx = make_optimizer(TrainConfig(learning_rate=5e-3, warmup_ratio=0.0,
                                    lr_schedule="constant"), total_steps=30)
    step = make_train_step(make_llama_moka_loss(CFG, SPEC, remat=True), tx)
    state = init_train_state(trainable, tx, jax.random.key(0))
    losses = []
    for _ in range(20):
        state, m = step(state, qbase, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.1, losses[::6]


def test_quantized_import_close_to_hf():
    """import_llama_quantized: logits stay close to the bf16 import and the
    original HF model (ties HF parity + quantization together)."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM
    from moka_tpu.ops.quant import import_llama_quantized
    from moka_tpu.train import import_torch as imp

    hf_cfg = HFConfig(vocab_size=97, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, max_position_embeddings=64,
                      rms_norm_eps=1e-5, attn_implementation="eager",
                      tie_word_embeddings=False)
    torch.manual_seed(3)
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(vocab_size=97, dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=4, intermediate=128, max_seq_len=64)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    qparams = import_llama_quantized(sd, cfg)
    fparams = imp.import_llama(sd, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    toks = rng.integers(1, 97, (2, 9)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()
    q_logits, _ = llama.forward(qparams, cfg, tokens=jnp.asarray(toks))
    f_logits, _ = llama.forward(fparams, cfg, tokens=jnp.asarray(toks))
    agree_q = np.mean(np.asarray(jnp.argmax(q_logits, -1))
                      == hf_logits.argmax(-1))
    assert agree_q > 0.85, agree_q
    rel = float(jnp.abs(q_logits - f_logits).mean()
                / jnp.abs(f_logits).mean())
    assert rel < 0.08, rel


def test_int4_roundtrip_and_matmul_parity():
    """Nibble-packed int4: dequant error bound, packed layout, and the
    split-contraction qmatmul matches a dense matmul on the dequantized
    weight (the scale applies once to the fp32 accumulator)."""
    from moka_tpu.ops.quant import qmatmul, quantize_int4

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 16, 8)) * 0.05, jnp.float32)
    qw = quantize_int4(w)
    assert qw["w_i4"].shape == (3, 8, 8) and qw["w_i4"].dtype == jnp.uint8
    back = dequantize(qw, dtype=jnp.float32)
    # symmetric [-7,7]: max error <= scale/2 = max|w|/14
    err = np.abs(np.asarray(back) - np.asarray(w)).max()
    assert err <= float(np.abs(np.asarray(w)).max()) / 14 + 1e-7

    w2 = w[0]
    q2 = quantize_int4(w2)
    x = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    ref = jnp.einsum("bld,df->blf", x, dequantize(q2, jnp.float32))
    got = qmatmul(x, q2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_int4_base_forward_close_and_trains():
    """7B-style flow at tiny scale: int4 base halves the int8 footprint,
    logits stay usable, adapter-only training still reduces the loss."""
    base = llama.init_llama_params(jax.random.key(0), CFG, dtype=jnp.float32)
    q8 = quantize_llama_base(base, bits=8)
    q4 = quantize_llama_base(base, bits=4)
    w8 = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(q8)
             if x.dtype == jnp.int8)
    w4 = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(q4)
             if x.dtype == jnp.uint8)
    assert w4 * 2 == w8

    toks = jnp.arange(32).reshape(2, 16) % 64
    full, _ = llama.forward(base, CFG, tokens=toks)
    quant, _ = llama.forward(q4, CFG, tokens=toks)
    agree = np.mean(np.asarray(jnp.argmax(full, -1) == jnp.argmax(quant, -1)))
    assert agree > 0.7, agree

    rng = np.random.default_rng(0)
    trainable = {"adapters": llama.init_moka_adapters(jax.random.key(2),
                                                      CFG, SPEC)}
    t2 = jnp.asarray(rng.integers(4, 64, (2, 16)), jnp.int32)
    batch = {"tokens": t2, "labels": t2}
    tx = make_optimizer(TrainConfig(learning_rate=5e-3, warmup_ratio=0.0,
                                    lr_schedule="constant"), total_steps=30)
    step = make_train_step(make_llama_moka_loss(CFG, SPEC, remat=True), tx)
    state = init_train_state(trainable, tx, jax.random.key(0))
    losses = []
    for _ in range(20):
        state, m = step(state, q4, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.1, losses[::6]


def test_int4_sharding_rules():
    from moka_tpu.parallel.sharding import spec_for_path
    from jax.sharding import PartitionSpec as P
    assert spec_for_path("llama/layers/q/w_i4", 3) == P(None, "fsdp", "model")
    assert spec_for_path("llama/layers/down/w_i4", 3) == P(None, "model",
                                                           "fsdp")
    assert spec_for_path("llama/layers/q/scale", 3) == P(None, None, "model")


def test_a8_matmul_matches_weight_only_and_ste_grad():
    """W8A8/W4A8 (`qmatmul_a8`): int8-activation forward stays within the
    per-token quantization error of the weight-only path, the backward is
    the straight-through dX of the dequant path (weights frozen, no dW),
    and all-zero token rows quantize to exact zeros."""
    from moka_tpu.ops.quant import qmatmul, qmatmul_a8, quantize_int4

    x = jax.random.normal(jax.random.key(0), (2, 16, 64), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (64, 48), jnp.float32) * 0.05
    for quant in (quantize_int8, quantize_int4):
        qw = quant(w)
        y_ref = qmatmul(x, qw).astype(jnp.float32)
        y_a8 = qmatmul_a8(x, qw).astype(jnp.float32)
        rel = float(jnp.linalg.norm(y_a8 - y_ref) / jnp.linalg.norm(y_ref))
        assert rel < 0.02, rel  # per-token int8: O(1/127) relative error

        g_ref = jax.grad(lambda x: qmatmul(x, qw).astype(jnp.float32).sum())(x)
        g_a8 = jax.grad(
            lambda x: qmatmul_a8(x, qw).astype(jnp.float32).sum())(x)
        grel = float(jnp.linalg.norm((g_a8 - g_ref).astype(jnp.float32)) /
                     jnp.linalg.norm(g_ref.astype(jnp.float32)))
        assert grel < 0.01, grel  # STE == dequant-path dX (bf16 rounding)

        # bwd_a8="full": forward bitwise-identical to the STE variant, dX
        # within the per-token int8 cotangent error of the STE dX.  A
        # weighted loss exercises a non-constant cotangent.
        gw = jax.random.normal(jax.random.key(2), (2, 16, 48), jnp.float32)
        y_f = qmatmul_a8(x, qw, bwd_a8=True).astype(jnp.float32)
        assert bool((y_f == y_a8).all())
        d_ste = jax.grad(lambda x: (qmatmul_a8(x, qw).astype(jnp.float32)
                                    * gw).sum())(x).astype(jnp.float32)
        d_ful = jax.grad(
            lambda x: (qmatmul_a8(x, qw, bwd_a8=True).astype(jnp.float32)
                       * gw).sum())(x).astype(jnp.float32)
        frel = float(jnp.linalg.norm(d_ful - d_ste) /
                     jnp.linalg.norm(d_ste))
        assert frel < 0.02, frel  # O(1/127) per-token cotangent error

    xz = x.at[0, 3].set(0)
    yz = qmatmul_a8(xz, quantize_int8(w)).astype(jnp.float32)
    assert bool(jnp.isfinite(yz).all())
    assert float(jnp.abs(yz[0, 3]).max()) == 0.0


def test_a8_dots_train_step_close_and_trains():
    """End-to-end: `a8_dots=True` through the decoder — loss within 2% of
    the weight-only path at init and adapter training still converges."""
    base = llama.init_llama_params(jax.random.key(0), CFG, dtype=jnp.float32)
    q4 = quantize_llama_base(base, bits=4)
    rng = np.random.default_rng(0)
    t2 = jnp.asarray(rng.integers(4, 64, (2, 16)), jnp.int32)
    batch = {"tokens": t2, "labels": t2}
    trainable = {"adapters": llama.init_moka_adapters(jax.random.key(2),
                                                      CFG, SPEC)}
    loss_ref = make_llama_moka_loss(CFG, SPEC, remat=True)
    loss_a8 = make_llama_moka_loss(CFG, SPEC, remat=True, a8_dots=True)
    l_ref = float(loss_ref(trainable, q4, batch, jax.random.key(0))[0])
    l_a8 = float(loss_a8(trainable, q4, batch, jax.random.key(0))[0])
    assert abs(l_a8 - l_ref) / l_ref < 0.02, (l_ref, l_a8)

    # a8_dots="full" changes only backward numerics: same forward loss
    loss_full = make_llama_moka_loss(CFG, SPEC, remat=True, a8_dots="full")
    l_full = float(loss_full(trainable, q4, batch, jax.random.key(0))[0])
    assert l_full == l_a8, (l_full, l_a8)

    tx = make_optimizer(TrainConfig(learning_rate=5e-3, warmup_ratio=0.0,
                                    lr_schedule="constant"), total_steps=30)
    for loss in (loss_a8, loss_full):
        step = make_train_step(loss, tx)
        # fresh copy per variant: the donated step deletes its inputs
        state = init_train_state(jax.tree.map(jnp.copy, trainable), tx,
                                 jax.random.key(0))
        losses = []
        for _ in range(20):
            state, m = step(state, q4, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] - 0.1, losses[::6]


def test_quantized_head_ce_and_logits_parity():
    """int8/int4-quantized frozen lm_head (quantize_llama_base head_bits):
    chunked CE loss and dL/dh stay close to the bf16 head on every a8
    variant, and forward(logits=True) consumes the quantized head."""
    rng = np.random.default_rng(0)
    b, L, d, V = 2, 32, 16, 96
    h = jnp.asarray(rng.normal(size=(b, L, d)), jnp.bfloat16)
    W = jnp.asarray(rng.normal(size=(d, V)) * 0.05, jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, V, (b, L)), jnp.int32)
    labels = labels.at[:, :5].set(-100)

    from moka_tpu.ops.quant import quantize_int4
    ref = float(llama.chunked_cross_entropy(h, W, labels, chunk=8))
    g_ref = jax.grad(lambda x: llama.chunked_cross_entropy(
        x, W, labels, chunk=8))(h.astype(jnp.float32))
    for qw, tol in ((quantize_int8(W, axis=-2), 0.01),
                    (quantize_int4(W, axis=-2), 0.05)):
        for a8 in (False, True, "full"):
            got = float(llama.chunked_cross_entropy(h, qw, labels, chunk=8,
                                                    a8=a8))
            assert abs(got - ref) / ref < tol, (a8, ref, got)
            g = jax.grad(lambda x: llama.chunked_cross_entropy(
                x, qw, labels, chunk=8, a8=a8))(h.astype(jnp.float32))
            rel = float(jnp.linalg.norm(g - g_ref) / jnp.linalg.norm(g_ref))
            assert rel < 10 * tol, (a8, rel)

    # full-model logits path with a head-quantized tree
    base = llama.init_llama_params(jax.random.key(0), CFG, dtype=jnp.float32)
    qbase = quantize_llama_base(base, bits=4, head_bits=8)
    toks = jnp.arange(32).reshape(2, 16) % 64
    full, _ = llama.forward(base, CFG, tokens=toks)
    quant, _ = llama.forward(qbase, CFG, tokens=toks)
    assert quant.dtype == jnp.float32
    agree = np.mean(np.asarray(jnp.argmax(full, -1) == jnp.argmax(quant, -1)))
    assert agree > 0.9, agree


def test_quantized_head_sharding_rules():
    from jax.sharding import PartitionSpec as P

    from moka_tpu.parallel.sharding import spec_for_path
    assert spec_for_path("llama/lm_head/w_i8", 2) == P("fsdp", "model")
    assert spec_for_path("llama/lm_head/w_i4", 2) == P("fsdp", "model")
    assert spec_for_path("llama/lm_head/scale", 2) == P(None, "model")
    # tree-root paths (the llama dict sharded bare, e.g. the dryrun)
    assert spec_for_path("lm_head/w_i8", 2) == P("fsdp", "model")
    assert spec_for_path("lm_head", 2) == P("fsdp", "model")
    assert spec_for_path("embed", 2) == P(None, "fsdp")


def test_quantized_head_train_step():
    """Adapter training over a head-quantized base converges (the CE
    backward flows dL/dh through the int8 head dot)."""
    base = llama.init_llama_params(jax.random.key(1), CFG, dtype=jnp.float32)
    qbase = quantize_llama_base(base, bits=4, head_bits=8)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(4, 64, (2, 16)), jnp.int32)
    batch = {"tokens": toks, "labels": toks}
    trainable = {"adapters": llama.init_moka_adapters(jax.random.key(2),
                                                      CFG, SPEC)}
    tx = make_optimizer(TrainConfig(learning_rate=5e-3, warmup_ratio=0.0,
                                    lr_schedule="constant"), total_steps=30)
    loss = make_llama_moka_loss(CFG, SPEC, remat=True, fused_loss=True,
                                ce_chunk=8, a8_dots="full")
    step = make_train_step(loss, tx)
    state = init_train_state(trainable, tx, jax.random.key(0))
    losses = []
    for _ in range(20):
        state, m = step(state, qbase, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.1, losses[::6]


def test_quantize_encoder_clip_and_beats_close():
    """int8 frozen towers (quantize_encoder): outputs stay close to fp32,
    tiny/norm/conv leaves pass through untouched, int4 also runs."""
    from moka_tpu.models import beats as beats_mod
    from moka_tpu.models import clip_vit
    from moka_tpu.ops.quant import is_quantized, quantize_encoder

    ccfg = clip_vit.ClipVitConfig.tiny()
    cp = clip_vit.init_clip_params(jax.random.key(0), ccfg)
    # widen the tiny tower so min_dim=64 engages on fc1/fc2
    cq = quantize_encoder(cp, bits=8, min_dim=16)
    assert is_quantized(cq["layers"]["q"]["w"])
    assert is_quantized(cq["layers"]["fc1"]["w"])
    # non-linear leaves untouched
    assert not isinstance(cq["patch"], dict)
    assert "g" in cq["layers"]["ln1"] and not is_quantized(cq["layers"]["ln1"])
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 3, 28, 28)), jnp.float32)
    ref = clip_vit.clip_hidden_states(cp, ccfg, img, (1, 2))
    got = clip_vit.clip_hidden_states(cq, ccfg, img, (1, 2))
    for r, g in zip(ref, got):
        err = np.abs(np.asarray(g - r)).mean() / \
            (np.abs(np.asarray(r)).mean() + 1e-9)
        assert err < 0.05, err

    bcfg = beats_mod.BeatsConfig.tiny()
    bp = beats_mod.init_beats_params(jax.random.key(1), bcfg)
    bq = quantize_encoder(bp, bits=8, min_dim=16)
    assert is_quantized(bq["layers"]["q"]["w"])
    # the (hd=12, 8) GRU gate head is below min_dim -> untouched
    assert not is_quantized(bq["layers"]["grep"]["w"])
    assert not isinstance(bq["pos_conv_w"], dict)
    fb = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    ref = beats_mod.beats_encode(bp, bcfg, fb)
    got = beats_mod.beats_encode(bq, bcfg, fb)
    err = np.abs(np.asarray(got - ref)).mean() / \
        (np.abs(np.asarray(ref)).mean() + 1e-9)
    assert err < 0.05, err

    # int4 path compiles and runs (even d_in only)
    c4 = quantize_encoder(cp, bits=4, min_dim=16)
    assert is_quantized(c4["layers"]["fc1"]["w"])
    out4 = clip_vit.clip_hidden_states(c4, ccfg, img, (2,))
    assert np.isfinite(np.asarray(out4[0])).all()


def test_quantized_encoders_multimodal_train_step():
    """Full unified train step with int8 towers: loss finite, close to the
    fp32-tower loss, and adapters still train."""
    from moka_tpu.models import unified
    from moka_tpu.ops.quant import quantize_encoder
    cfg = unified.UnifiedConfig.tiny()
    frozen = unified.init_frozen(jax.random.key(0), cfg, dtype=jnp.float32)
    qfrozen = dict(frozen)
    qfrozen["clip"] = quantize_encoder(frozen["clip"], bits=8, min_dim=16)
    qfrozen["beats"] = quantize_encoder(frozen["beats"], bits=8, min_dim=16)
    trainable = unified.init_trainable(jax.random.key(1), cfg)

    from moka_tpu.data import assembler as asm
    rng = np.random.default_rng(0)
    b, L = 2, 96
    base_v = cfg.llama.vocab_size - len(asm.SPECIAL_TOKENS)
    t2i = {t: base_v + i for i, t in enumerate(asm.SPECIAL_TOKENS)}
    samples = []
    nv = 2 * cfg.vl_projector.num_query_tokens
    na = 2 * cfg.al_projector.num_query_tokens
    for i in range(b):
        ids = ([5, 6] + [t2i["<video_start>"], t2i["<video>"],
                         t2i["<video_end>"]]
               + [t2i["<audio_start>"], t2i["<audio>"], t2i["<audio_end>"]]
               + rng.integers(4, base_v, 6).tolist())
        lab = [-100] * (len(ids) - 4) + ids[-4:]
        samples.append(asm.assemble_sample(
            np.asarray(ids), np.asarray(lab), t2i, pad_id=0,
            n_video_tokens=nv, n_audio_tokens=na))
    batch = asm.pad_batch(samples, pad_id=0, pad_to=L)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch["video"] = jnp.asarray(rng.standard_normal(
        (b, 2, 3, cfg.clip.image_size, cfg.clip.image_size)), jnp.float32)
    batch["audio"] = jnp.asarray(rng.standard_normal((b, 2, 32, 128)),
                                 jnp.float32)

    loss_fn = unified.unified_loss(cfg)
    l_ref, _ = loss_fn(trainable, frozen, batch, jax.random.key(0))
    l_q, _ = loss_fn(trainable, qfrozen, batch, jax.random.key(0))
    assert np.isfinite(float(l_q))
    assert abs(float(l_q) - float(l_ref)) < 0.05 * abs(float(l_ref)) + 0.05

    tx = make_optimizer(TrainConfig(learning_rate=5e-3, warmup_ratio=0.0,
                                    lr_schedule="constant"), total_steps=20)
    step = make_train_step(unified.unified_loss(cfg), tx)
    state = init_train_state(trainable, tx, jax.random.key(0))
    losses = []
    for _ in range(10):
        state, m = step(state, qfrozen, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_encoder_a8_dots_close_and_distinct():
    """ClipVitConfig/BeatsConfig a8_dots: per-token int8 activations on the
    quantized towers' dense dots (fwd-only W8A8).  Output must stay within
    the a8 error envelope of the weight-only int8 tower AND differ from it
    measurably (a silent bypass would be bitwise-identical)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from moka_tpu.models.clip_vit import (ClipVitConfig, clip_hidden_states,
                                          init_clip_params)
    from moka_tpu.ops.quant import quantize_encoder

    cfg = ClipVitConfig.tiny()
    params = quantize_encoder(
        init_clip_params(jax.random.key(0), cfg, dtype=jnp.float32),
        min_dim=16)
    imgs = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 3, cfg.image_size, cfg.image_size)), jnp.float32)
    base = clip_hidden_states(params, cfg, imgs, (cfg.n_layers - 1,))[0]
    a8 = clip_hidden_states(
        params, dataclasses.replace(cfg, a8_dots=True), imgs,
        (cfg.n_layers - 1,))[0]
    err = float(jnp.max(jnp.abs(a8 - base)) /
                (jnp.max(jnp.abs(base)) + 1e-9))
    assert err < 0.1, err
    assert float(jnp.max(jnp.abs(a8 - base))) > 0, "a8 path bypassed"


def test_clip_flash_attention_parity():
    """ClipVitConfig.use_flash must match the eager tower numerically
    (non-causal maskless flash over the 257-token patch sequences)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from moka_tpu.models.clip_vit import (ClipVitConfig, clip_hidden_states,
                                          init_clip_params)

    cfg = ClipVitConfig.tiny()
    params = init_clip_params(jax.random.key(0), cfg, dtype=jnp.float32)
    imgs = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 3, cfg.image_size, cfg.image_size)), jnp.float32)
    base = clip_hidden_states(params, cfg, imgs, (cfg.n_layers,))[0]
    fl = clip_hidden_states(params, dataclasses.replace(cfg, use_flash=True),
                            imgs, (cfg.n_layers,))[0]
    np.testing.assert_allclose(np.asarray(fl), np.asarray(base),
                               rtol=2e-4, atol=2e-4)


def test_q8_roundtrip_value_and_straight_through_grad():
    """quant.q8_roundtrip: per-token int8 quantize->dequantize error bound
    and identity (straight-through) gradient."""
    from moka_tpu.ops.quant import q8_roundtrip

    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((2, 8, 32)) * 3.0, jnp.float32)
    out = np.asarray(q8_roundtrip("probe", y))
    rowmax = np.abs(np.asarray(y)).max(-1, keepdims=True)
    assert np.all(np.abs(out - np.asarray(y)) <= rowmax / 127 * 0.5 + 1e-6)

    g = jax.grad(lambda v: float(2.0) * jnp.sum(q8_roundtrip("probe", v)))(y)
    np.testing.assert_allclose(np.asarray(g), 2.0)

    # all-zero rows quantize to exact zeros (scale-1 guard in _a8_quantize)
    z = jnp.zeros((1, 4, 16), jnp.float32)
    assert float(jnp.abs(q8_roundtrip("probe", z)).max()) == 0.0

    # bf16 activations (the flagship's working dtype) keep their dtype and
    # the same per-token bound
    yb = y.astype(jnp.bfloat16)
    ob = q8_roundtrip("probe", yb)
    assert ob.dtype == jnp.bfloat16
    err = np.abs(np.asarray(ob, np.float32) - np.asarray(yb, np.float32))
    assert np.all(err <= rowmax / 127 * 0.5 + 0.02 * rowmax)  # + bf16 ulp


def test_save_q8_train_step_close_and_trains():
    """save_q8=True (quantized remat save set) through the full decoder:
    loss within 2% of the unquantized-save path, gradients close, and
    adapter training still converges under the policy whose saved
    projections it quantizes."""
    rng = np.random.default_rng(0)
    base = llama.init_llama_params(jax.random.key(0), CFG, dtype=jnp.float32)
    q4 = quantize_llama_base(base, bits=4)
    t2 = jnp.asarray(rng.integers(4, 64, (2, 16)), jnp.int32)
    mod = np.zeros((3, 2, 16), np.float32)
    mod[0, :, :8] = 1
    mod[1, :, 8:12] = 1
    mod[2, :, 12:] = 1
    qm = np.zeros((2, 16), np.float32)
    qm[:, 4:8] = 1
    batch = {"tokens": t2, "labels": t2,
             "modality_masks": jnp.asarray(mod),
             "question_mask": jnp.asarray(qm)}
    trainable = {"adapters": llama.init_moka_adapters(jax.random.key(2),
                                                      CFG, SPEC)}
    kw = dict(remat=True, remat_policy="proj_nokv", a8_dots="full")
    loss_ref = make_llama_moka_loss(CFG, SPEC, **kw)
    loss_q8 = make_llama_moka_loss(CFG, SPEC, save_q8=True, **kw)
    l_ref = float(loss_ref(trainable, q4, batch, jax.random.key(0))[0])
    l_q8 = float(loss_q8(trainable, q4, batch, jax.random.key(0))[0])
    assert abs(l_q8 - l_ref) / abs(l_ref) < 0.02, (l_ref, l_q8)
    assert l_q8 != l_ref  # the quantized saves really are in the fwd path

    g_ref = jax.grad(lambda t: loss_ref(t, q4, batch, jax.random.key(0))[0])(
        trainable)
    g_q8 = jax.grad(lambda t: loss_q8(t, q4, batch, jax.random.key(0))[0])(
        trainable)
    nr = float(jnp.sqrt(sum(jnp.sum(a.astype(jnp.float32) ** 2)
                            for a in jax.tree.leaves(g_ref))))
    nd = float(jnp.sqrt(sum(jnp.sum((a - b).astype(jnp.float32) ** 2)
                            for a, b in zip(jax.tree.leaves(g_ref),
                                            jax.tree.leaves(g_q8)))))
    assert nd / nr < 0.05, nd / nr

    # explicit proj-name tuple selects the same path as the policy-derived
    # set for this policy
    loss_t = make_llama_moka_loss(
        CFG, SPEC, save_q8=("q", "o", "down", "gate", "up"), **kw)
    assert float(loss_t(trainable, q4, batch, jax.random.key(0))[0]) == l_q8

    tx = make_optimizer(TrainConfig(learning_rate=5e-3, warmup_ratio=0.0,
                                    lr_schedule="constant"), total_steps=30)
    step = make_train_step(loss_q8, tx)
    state = init_train_state(jax.tree.map(jnp.copy, trainable), tx,
                             jax.random.key(0))
    losses = []
    for _ in range(20):
        state, m = step(state, q4, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.1, losses[::6]


def test_fp8_roundtrip_and_forward_variant():
    """fp8-e4m3 save-set variant: value close, straight-through grad, and
    the ("fp8", ...) tuple form routes the decoder through it."""
    from moka_tpu.ops.quant import fp8_roundtrip

    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.standard_normal((2, 8, 32)) * 3.0, jnp.float32)
    out = np.asarray(fp8_roundtrip("probe", y))
    # e4m3: 3 mantissa bits -> relative step <= 2^-3 (plus denormal floor)
    assert np.all(np.abs(out - np.asarray(y)) <=
                  np.abs(np.asarray(y)) * 0.0667 + 2e-2)
    g = jax.grad(lambda v: 3.0 * jnp.sum(fp8_roundtrip("probe", v)))(y)
    np.testing.assert_allclose(np.asarray(g), 3.0)

    base = llama.init_llama_params(jax.random.key(0), CFG, dtype=jnp.float32)
    toks = jnp.arange(32).reshape(2, 16) % 64
    plain, _ = llama.forward(base, CFG, tokens=toks)
    f8, _ = llama.forward(base, CFG, tokens=toks,
                          save_q8=("fp8", "gate", "up", "o"))
    d = float(jnp.max(jnp.abs(plain - f8)))
    assert d > 0, "fp8 save path bypassed"
    assert d / float(jnp.max(jnp.abs(plain))) < 0.1
