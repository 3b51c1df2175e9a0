"""VT (bi-modal) slice: sample construction semantics + end-to-end train /
generate on tiny configs."""

import numpy as np
import jax
import jax.numpy as jnp

from moka_tpu.core.config import TrainConfig
from moka_tpu.data.vt_dataset import (IGNORE, build_vt_sample, collate_vt,
                                      target_spans_from_markers)
from moka_tpu.models import llava
from moka_tpu.train.optim import make_optimizer
from moka_tpu.train.step import init_train_state, make_train_step

CFG = llava.LlavaConfig.tiny()
NQ = CFG.projector.num_query_tokens  # 4


def test_build_vt_sample_masks():
    ph, pad = 99, 0
    ids = np.array([5, 6] + [ph] * NQ + [7, 8, 9, 10])
    labels = np.array([-100, -100] + [-100] * NQ + [-100, -100, 9, 10])
    s = build_vt_sample(ids, labels, ph, pad, num_image_tokens=NQ)
    np.testing.assert_array_equal(s["image_pos"], [2, 3, 4, 5])
    np.testing.assert_array_equal(s["image_mask"][2:6], [1, 1, 1, 1])
    np.testing.assert_array_equal(s["text_mask"],
                                  [1, 1, 0, 0, 0, 0, 1, 1, 1, 1])
    # question = after last image, label==-100, non-image -> positions 6,7
    np.testing.assert_array_equal(s["question_mask"],
                                  [0, 0, 0, 0, 0, 0, 1, 1, 0, 0])
    assert (s["ids"][2:6] == pad).all()


def test_target_spans():
    # ids: x x [/INST] a b </s> x [/INST] c </s>
    marker = np.array([70, 71])
    ids = np.array([1, 2, 70, 71, 30, 31, 9, 4, 70, 71, 40, 9])
    labels = target_spans_from_markers(ids, marker, eos_id=9)
    np.testing.assert_array_equal(
        labels, [-100, -100, -100, -100, 30, 31, 9, -100, -100, -100, 40, 9])


def _vt_batch(b=2, seed=0):
    rng = np.random.default_rng(seed)
    ph, pad = 99, 0
    samples = []
    for i in range(b):
        pre = rng.integers(4, 90, 2 + i).tolist()
        q = rng.integers(4, 90, 3).tolist()
        ans = rng.integers(4, 90, 3).tolist()
        ids = np.array(pre + [ph] * NQ + q + ans)
        labels = np.array([-100] * (len(pre) + NQ + len(q)) + ans)
        samples.append(build_vt_sample(ids, labels, ph, pad,
                                       num_image_tokens=NQ))
    batch = collate_vt(samples, pad_id=pad, pad_to=16)
    img = CFG.clip.image_size
    batch["pixel_values"] = rng.standard_normal((b, 3, img, img)) \
        .astype(np.float32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_llava_train_loss_decreases():
    r1, r2 = jax.random.split(jax.random.key(0))
    frozen = llava.init_frozen(r1, CFG, dtype=jnp.float32)
    trainable = llava.init_trainable(r2, CFG)
    batch = _vt_batch()
    tx = make_optimizer(TrainConfig(learning_rate=3e-3, warmup_ratio=0.0,
                                    lr_schedule="constant"), total_steps=40)
    step = make_train_step(llava.llava_loss(CFG, remat=True), tx)
    state = init_train_state(trainable, tx, jax.random.key(1))
    losses = []
    for _ in range(25):
        state, m = step(state, frozen, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.2, losses[::8]


def test_llava_generate():
    r1, r2 = jax.random.split(jax.random.key(1))
    frozen = llava.init_frozen(r1, CFG, dtype=jnp.float32)
    trainable = llava.init_trainable(r2, CFG)
    batch = _vt_batch(seed=2)
    # generation needs left-padding; VT eval runs batch=1 (mmbench.py:594) so
    # right-pad == no pad for the single sample case; emulate with full rows
    toks = llava.generate(trainable, frozen, CFG, batch, max_new_tokens=3,
                          eos_id=2, pad_id=0)
    assert toks.shape == (2, 3)
