"""End-to-end AVT slice on tiny configs: host assembler -> CLIP/BEATs ->
projectors -> MokA-LLaMA -> CE loss; training decreases loss with adapters
AND projectors updating; multimodal generation runs the full prefill path."""

import numpy as np
import jax
import jax.numpy as jnp

from moka_tpu.core.config import TrainConfig
from moka_tpu.data import assembler as asm
from moka_tpu.models import unified
from moka_tpu.train.optim import make_optimizer
from moka_tpu.train.step import init_train_state, make_train_step

CFG = unified.UnifiedConfig.tiny()


def _vocab():
    """Toy vocab: ids 0..199 text, 200+ special."""
    base = 200
    token_to_id = {t: base + i for i, t in enumerate(asm.SPECIAL_TOKENS)}
    return token_to_id


def _make_batch(b=2, seed=0):
    """AVQA-style prompt: text | <video_start> <video> <video_end> | text |
    <audio_start> <audio> <audio_end> | <question_start> q <question_end> |
    answer."""
    rng = np.random.default_rng(seed)
    t2i = _vocab()
    t_frames, t_aud = 2, 2
    nv = t_frames * CFG.vl_projector.num_query_tokens  # 8
    na = t_aud * CFG.al_projector.num_query_tokens     # 8
    samples = []
    for i in range(b):
        prefix = rng.integers(4, 200, 3 + i).tolist()  # ragged lengths
        q_toks = rng.integers(4, 200, 4).tolist()
        answer = rng.integers(4, 200, 3).tolist()
        ids = (prefix + [t2i["<video_start>"], t2i["<video>"],
                         t2i["<video_end>"]]
               + [t2i["<audio_start>"], t2i["<audio>"], t2i["<audio_end>"]]
               + [t2i["<question_start>"]] + q_toks + [t2i["<question_end>"]]
               + answer)
        labels = [-100] * (len(ids) - len(answer)) + answer
        samples.append(asm.assemble_sample(
            np.asarray(ids), np.asarray(labels), t2i, pad_id=0,
            n_video_tokens=nv, n_audio_tokens=na))
    batch = asm.pad_batch(samples, pad_id=0, pad_to=40)
    # raw modality inputs
    img = CFG.clip.image_size
    batch["video"] = rng.standard_normal(
        (b, t_frames, 3, img, img)).astype(np.float32)
    batch["audio"] = rng.standard_normal(
        (b, t_aud, 32, 128)).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_assembler_semantics():
    t2i = _vocab()
    ids = np.array([5, 6, t2i["<video>"], 7, t2i["<question_start>"], 8, 9,
                    t2i["<question_end>"], 10])
    labels = np.array([-100] * 8 + [10])
    s = asm.assemble_sample(ids, labels, t2i, pad_id=0, n_video_tokens=3,
                            n_audio_tokens=0)
    # markers dropped: 5 6 [vvv] 7 8 9 10
    np.testing.assert_array_equal(s.ids, [5, 6, 0, 0, 0, 7, 8, 9, 10])
    np.testing.assert_array_equal(s.video_mask, [0, 0, 1, 1, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(s.text_mask, [1, 1, 0, 0, 0, 1, 1, 1, 1])
    # question span = tokens between the markers only
    np.testing.assert_array_equal(s.question_mask,
                                  [0, 0, 0, 0, 0, 0, 1, 1, 0])
    np.testing.assert_array_equal(s.video_pos, [2, 3, 4])
    np.testing.assert_array_equal(s.labels,
                                  [-100, -100, -100, -100, -100, -100, -100,
                                   -100, 10])


def test_pad_batch_left_pads_and_positions():
    t2i = _vocab()
    s1 = asm.assemble_sample(np.array([5, 6, 7]), np.array([5, 6, 7]), t2i,
                             pad_id=0, n_video_tokens=0, n_audio_tokens=0)
    s2 = asm.assemble_sample(np.array([5]), np.array([5]), t2i, pad_id=0,
                             n_video_tokens=0, n_audio_tokens=0)
    b = asm.pad_batch([s1, s2], pad_id=0)
    np.testing.assert_array_equal(b["attn_mask"], [[1, 1, 1], [0, 0, 1]])
    np.testing.assert_array_equal(b["positions"], [[0, 1, 2], [0, 0, 0]])
    np.testing.assert_array_equal(b["labels"][1], [-100, -100, 5])


def test_unified_train_loss_decreases():
    r1, r2 = jax.random.split(jax.random.key(0))
    frozen = unified.init_frozen(r1, CFG, dtype=jnp.float32)
    trainable = unified.init_trainable(r2, CFG)
    batch = _make_batch()

    tcfg = TrainConfig(learning_rate=3e-3, warmup_ratio=0.0,
                       lr_schedule="constant")
    tx = make_optimizer(tcfg, total_steps=40)
    loss_fn = unified.unified_loss(CFG, remat=True)
    step = make_train_step(loss_fn, tx)
    vl0 = jax.tree.map(np.asarray, trainable["vl_projector"])  # pre-donation
    state = init_train_state(trainable, tx, jax.random.key(1))
    losses = []
    for _ in range(25):
        state, m = step(state, frozen, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.2, losses[::8]
    # projector params actually moved (stage-1 behavior embedded in stage-2)
    d = jax.tree.map(lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()),
                     vl0, state.params["vl_projector"])
    assert max(jax.tree.leaves(d)) > 0


def test_stage1_pretrain_mode_no_adapters():
    """Stage-1: projector-only training against the plain-linear twin."""
    r1, r2 = jax.random.split(jax.random.key(2))
    frozen = unified.init_frozen(r1, CFG, dtype=jnp.float32)
    trainable = unified.init_trainable(r2, CFG, with_adapters=False)
    batch = _make_batch(seed=3)
    loss_fn = unified.unified_loss(CFG, remat=False, train_adapters=False)
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        trainable, frozen, batch, jax.random.key(0))
    assert np.isfinite(float(loss))
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(grads))
    assert total > 0


def test_unified_generate():
    r1, r2 = jax.random.split(jax.random.key(4))
    frozen = unified.init_frozen(r1, CFG, dtype=jnp.float32)
    trainable = unified.init_trainable(r2, CFG)
    batch = _make_batch(seed=5)
    toks = unified.generate(trainable, frozen, CFG, batch,
                            max_new_tokens=4, eos_id=2, pad_id=0)
    assert toks.shape == (2, 4)
    assert np.asarray(toks).dtype == np.int32


def test_stage1_trainable_new_token_embeds():
    """Stage-1 also trains embedding rows for the appended special tokens
    (pretrain.py:71-109); they overlay the frozen table and get gradients."""
    r1, r2 = jax.random.split(jax.random.key(7))
    frozen = unified.init_frozen(r1, CFG, dtype=jnp.float32)
    trainable = unified.init_trainable(r2, CFG, with_adapters=False,
                                       n_new_token_embeds=11, frozen=frozen)
    batch = _make_batch(seed=9)
    # force some ids into the new-token range
    base = CFG.llama.vocab_size - 11
    ids = np.asarray(batch["ids"]).copy()
    ids[:, -3] = base + 3  # a real (non-pad) position near the sequence end
    batch["ids"] = jnp.asarray(ids)
    loss_fn = unified.unified_loss(CFG, remat=False, train_adapters=False)
    (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        trainable, frozen, batch, jax.random.key(0))
    g = np.asarray(grads["new_token_embeds"])
    assert np.abs(g[3]).sum() > 0          # used row gets gradient
    assert np.abs(g[5]).sum() == 0         # unused row does not


def test_question_conditioned_projection():
    """Instruction-aware Q-Former path: a question changes the projected
    tokens (the reference wires it but passes None in both stages)."""
    r1, r2 = jax.random.split(jax.random.key(11))
    frozen = unified.init_frozen(r1, CFG, dtype=jnp.float32)
    trainable = unified.init_trainable(r2, CFG)
    batch = _make_batch(seed=12)
    v0 = unified.encode_modalities(trainable, frozen, CFG,
                                   batch["video"], None)[0]
    qids = jnp.asarray(np.random.default_rng(0).integers(
        1, 99, (2, 5)), jnp.int32)
    qmask = jnp.ones((2, 5), jnp.int32)
    v1 = unified.encode_modalities(trainable, frozen, CFG, batch["video"],
                                   None, question_ids=qids,
                                   question_text_mask=qmask)[0]
    assert float(jnp.abs(v1 - v0).max()) > 1e-5
