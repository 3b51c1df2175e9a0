"""Golden-file regression: our scorers must reproduce the reference's
published numbers from its released prediction files (BASELINE.md):
MMBench 56.02, POPE 77.07, MME perception 1105.51, AVE 77.06 (397 valid)."""

import os

import pytest

from moka_tpu.eval.scorers import ave, mme, options

REF = "/root/reference"
MMBENCH = f"{REF}/VisualText/eval_benchmarks/mmbench/merged.jsonl"
POPE = f"{REF}/VisualText/eval_benchmarks/pope/merged.jsonl"
MME = f"{REF}/VisualText/eval_benchmarks/mme/merged.jsonl"
AVE = f"{REF}/AudioVisualText/scripts/evaluation/inference_ave.jsonl"
ANNOT = f"{REF}/AudioVisualText/scripts/evaluation/Annotations.txt"


@pytest.mark.skipif(not os.path.exists(MMBENCH), reason="golden file absent")
def test_mmbench_golden():
    out = options.score_option_file(MMBENCH)
    assert abs(out["accuracy"] - 56.02) < 0.05, out


@pytest.mark.skipif(not os.path.exists(POPE), reason="golden file absent")
def test_pope_golden():
    out = options.score_yesno_file(POPE)
    assert abs(out["accuracy"] - 77.07) < 0.05, out


@pytest.mark.skipif(not os.path.exists(MME), reason="golden file absent")
def test_mme_golden():
    # The released predictions score 1139.14 under the official MME protocol
    # (see moka_tpu/eval/scorers/mme.py docstring on the README's 1105.51).
    out = mme.score_file(MME)
    assert abs(out["perception"] - 1139.14) < 0.05, out["perception"]
    assert len(out["subtasks"]) == 14


@pytest.mark.skipif(not os.path.exists(AVE), reason="golden file absent")
def test_ave_golden():
    out = ave.score_file(AVE, ANNOT)
    assert out["valid"] == 397, out
    assert abs(out["accuracy"] - 0.7706) < 0.002, out
