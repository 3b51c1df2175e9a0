"""Quality anchor for the int8/int4 frozen base (VERDICT r2 item 2).

The flagship bench rides on a quantized frozen base while the reference
trains against bf16 (``ft_musicavqa.sh:41``).  This pins the claim that the
storage format of the frozen weights does not change training dynamics:
same seed, same data stream, same adapter init, only bf16 vs int8 vs int4
base — the loss curves must track each other inside a stated band.  The
on-chip 1B-scale version of the same study is in PERFORMANCE.md
(``exp_quant_quality.py --scale 1b``).
"""

import numpy as np
import pytest

from exp_quant_quality import run_variant

STEPS = 100


@pytest.fixture(scope="module")
def runs():
    return {v: run_variant(v, "tiny", steps=STEPS)
            for v in ("bf16", "int8", "int4", "int4a8", "int4a8f",
                      "int4a8fqh")}


def test_training_actually_learns(runs):
    r = runs["bf16"]
    first = r["train_curve"][0][1]
    assert first - r["final_train_loss"] > 0.15, r["train_curve"]


def test_int8_within_band_of_bf16(runs):
    ref, q = runs["bf16"], runs["int8"]
    assert abs(q["heldout_loss"] - ref["heldout_loss"]) / \
        ref["heldout_loss"] < 0.01, (q["heldout_loss"], ref["heldout_loss"])
    # the whole curve tracks, not just the endpoint
    for (i, a), (j, b) in zip(ref["train_curve"], q["train_curve"]):
        assert i == j and abs(a - b) / a < 0.01, (i, a, b)


def test_int4_within_band_of_bf16(runs):
    ref, q = runs["bf16"], runs["int4"]
    assert abs(q["heldout_loss"] - ref["heldout_loss"]) / \
        ref["heldout_loss"] < 0.02, (q["heldout_loss"], ref["heldout_loss"])
    for (i, a), (j, b) in zip(ref["train_curve"], q["train_curve"]):
        assert i == j and abs(a - b) / a < 0.02, (i, a, b)


def test_int4a8_within_band_of_bf16(runs):
    """W4A8 (flagship recipe): per-token int8 activations on the frozen-base
    dots must track the bf16 curve inside the same band as int4."""
    ref, q = runs["bf16"], runs["int4a8"]
    assert abs(q["heldout_loss"] - ref["heldout_loss"]) / \
        ref["heldout_loss"] < 0.02, (q["heldout_loss"], ref["heldout_loss"])
    for (i, a), (j, b) in zip(ref["train_curve"], q["train_curve"]):
        assert i == j and abs(a - b) / a < 0.02, (i, a, b)


def test_int4a8f_within_band_of_bf16(runs):
    """Full-int8 backward (flagship recipe): additionally quantizing the
    cotangent for the dX dots must keep the training dynamics inside the
    same band as the weight-only/STE arms."""
    ref, q = runs["bf16"], runs["int4a8f"]
    assert abs(q["heldout_loss"] - ref["heldout_loss"]) / \
        ref["heldout_loss"] < 0.02, (q["heldout_loss"], ref["heldout_loss"])
    for (i, a), (j, b) in zip(ref["train_curve"], q["train_curve"]):
        assert i == j and abs(a - b) / a < 0.02, (i, a, b)


def test_int4a8fqh_within_band_of_bf16(runs):
    """Quantized lm_head (flagship recipe): the int8 head changes the CE
    logits themselves, not just hidden-state numerics — the full recipe
    (int4 base + a8 fwd/bwd dots + int8 head) must stay in the int4 band."""
    ref, q = runs["bf16"], runs["int4a8fqh"]
    assert abs(q["heldout_loss"] - ref["heldout_loss"]) / \
        ref["heldout_loss"] < 0.02, (q["heldout_loss"], ref["heldout_loss"])
    for (i, a), (j, b) in zip(ref["train_curve"], q["train_curve"]):
        assert i == j and abs(a - b) / a < 0.02, (i, a, b)


def test_quantized_forward_is_actually_different(runs):
    """Guard against the study silently comparing identical computations:
    the quantized base must produce a (small but) nonzero loss difference."""
    assert runs["bf16"]["train_curve"][0][1] != \
        runs["int4"]["train_curve"][0][1]
