"""Full CLI integration: the finetune driver runs end to end on the tiny
preset with synthetic media + a real tokenizers-lib tokenizer.json, training
for a few steps and exporting reference-format artifacts."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def tiny_world(tmp_path):
    # --- toy tokenizer.json (WordLevel) ---
    from tokenizers import Tokenizer, models, pre_tokenizers
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
    words = ("this is a video audio please answer the question how many "
             "instruments two [INST] [/INST] <<SYS>> you are helpful "
             "assistant . : ? <answer> </answer>").split()
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok_path = str(tmp_path / "tokenizer.json")
    tok.save(tok_path)

    # --- synthetic video + 60s wav + avqa annotation ---
    import cv2
    from scipy.io import wavfile
    rng = np.random.default_rng(0)
    vid = str(tmp_path / "v.avi")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 5, (32, 32))
    for _ in range(8):
        w.write(rng.integers(0, 255, (32, 32, 3), np.uint8))
    w.release()
    wav = str(tmp_path / "a.wav")
    wavfile.write(wav, 16000,
                  (rng.standard_normal(16000 * 60) * 3000).astype(np.int16))
    ann = [{"video_id": f"v{i}", "question_id": i,
            "type": ["Audio", "Counting"], "video_path": vid,
            "audio_path": wav, "question": "how many instruments ?",
            "answer": "two", "label": "<answer> two </answer>"}
           for i in range(4)]
    ann_path = str(tmp_path / "avqa.json")
    json.dump(ann, open(ann_path, "w"))
    return {"tokenizer": tok_path, "annotation": ann_path,
            "out": str(tmp_path / "run")}


def test_finetune_cli_tiny_end_to_end(tiny_world):
    from moka_tpu.cli.finetune import main
    main([
        "--tokenizer-json", tiny_world["tokenizer"],
        "--avqa-annotation", tiny_world["annotation"],
        "--output-dir", tiny_world["out"],
        "--model-preset", "tiny",
        "--global-batch", "2",
        "--epochs", "1",
        "--pad-to", "128",
        "--learning-rate", "1e-3",
        "--question-window", "16",
    ])
    out = tiny_world["out"]
    assert os.path.exists(os.path.join(out, "adapter_model.bin"))
    assert os.path.exists(os.path.join(out, "non_lora_trainables.bin"))
    assert os.path.exists(os.path.join(out, "saved_config.json"))
    metrics = [json.loads(l) for l in
               open(os.path.join(out, "metrics.jsonl"))]
    assert len(metrics) >= 2
    assert all(np.isfinite(m["loss"]) for m in metrics)

    # --- full lifecycle: reload the exported artifacts through the torch
    # importers and run the distributed inference driver + scorer ---
    from moka_tpu.cli.infer import main as infer_main
    infer_out = os.path.join(out, "infer")
    infer_main([
        "--tokenizer-json", tiny_world["tokenizer"],
        "--annotation", tiny_world["annotation"],
        "--adapter-ckpt", os.path.join(out, "adapter_model.bin"),
        "--non-lora-ckpt", os.path.join(out, "non_lora_trainables.bin"),
        "--output-dir", infer_out,
        "--model-preset", "tiny",
        "--task", "avqa",
        "--batch-size", "2",
        "--max-new-tokens", "4",
        "--pad-to", "128",
    ])
    shard = os.path.join(infer_out, "result_rank0_avqa.jsonl")
    rows = [json.loads(l) for l in open(shard)]
    assert len(rows) == 4
    assert all("predict" in r and "question_type" in r for r in rows)

    # scorer consumes the rows directly (random model -> 0 parseable is ok)
    from moka_tpu.eval.scorers.avqa import score_rows
    out_scores = score_rows(rows)
    assert "overall" in out_scores


def test_finetune_cli_loftq_quantized(tiny_world):
    """--quantize-base 4 --loftq-iters 2: the quantized base trains with
    LoftQ-initialized adapters (nonzero B at step 0) end to end."""
    import torch
    from moka_tpu.cli.finetune import main
    main([
        "--tokenizer-json", tiny_world["tokenizer"],
        "--avqa-annotation", tiny_world["annotation"],
        "--output-dir", tiny_world["out"],
        "--model-preset", "tiny",
        "--global-batch", "2",
        "--epochs", "1",
        "--pad-to", "128",
        "--quantize-base", "4",
        "--loftq-iters", "2",
    ])
    out = tiny_world["out"]
    metrics = [json.loads(l) for l in
               open(os.path.join(out, "metrics.jsonl"))]
    assert all(np.isfinite(m["loss"]) for m in metrics)
    sd = torch.load(os.path.join(out, "adapter_model.bin"),
                    weights_only=True)
    b_keys = [k for k in sd if ".lora_B0.weight" in k or "lora_B" in k]
    assert b_keys and any(float(sd[k].abs().max()) > 0 for k in b_keys), \
        "LoftQ init must export nonzero B"


def test_finetune_cli_w4a8(tiny_world):
    """--quantize-base 4 --a8-dots full (the flagship W4A8 recipe): int8
    activations on the frozen dots — forward AND backward-dX — train end
    to end with finite, decreasing loss and export the same artifact
    set."""
    from moka_tpu.cli.finetune import main
    main([
        "--tokenizer-json", tiny_world["tokenizer"],
        "--avqa-annotation", tiny_world["annotation"],
        "--output-dir", tiny_world["out"],
        "--model-preset", "tiny",
        "--global-batch", "2",
        "--epochs", "2",
        "--pad-to", "128",
        "--learning-rate", "1e-3",
        "--quantize-base", "4",
        "--a8-dots", "full",
    ])
    out = tiny_world["out"]
    assert os.path.exists(os.path.join(out, "adapter_model.bin"))
    metrics = [json.loads(l) for l in
               open(os.path.join(out, "metrics.jsonl"))]
    assert len(metrics) >= 4
    assert all(np.isfinite(m["loss"]) for m in metrics)
    assert metrics[-1]["loss"] < metrics[0]["loss"]


def test_train_vt_cli_tiny_end_to_end(tmp_path):
    """VT driver smoke: tiny random-init LLaVA, LLaVA-Instruct-style JSON +
    synthetic image -> finite losses + model.safetensors in the reference
    schema."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from PIL import Image

    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
    for w in ("what color is the square ? purple [INST] [/INST] <<SYS>> "
              "you are helpful assistant .").split():
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok_path = str(tmp_path / "tokenizer.json")
    tok.save(tok_path)

    img_root = tmp_path / "imgs"
    img_root.mkdir()
    Image.new("RGB", (48, 48), (120, 30, 200)).save(img_root / "a.png")
    data = [{"image": "a.png",
             "conversations": [
                 {"from": "human", "value": "<image> what color is the square ?"},
                 {"from": "gpt", "value": "purple"}]}
            for _ in range(4)]
    data_json = str(tmp_path / "insts.json")
    json.dump(data, open(data_json, "w"))

    out = str(tmp_path / "run")
    from moka_tpu.cli.train_vt import main
    main(["--tokenizer-json", tok_path,
          "--data-json", data_json,
          "--image-root", str(img_root),
          "--output-dir", out,
          "--model-preset", "tiny",
          "--global-batch", "2",
          "--epochs", "1",
          "--pad-to", "64",
          "--lora-dropout", "0.0",
          "--learning-rate", "1e-3",
          "--question-window", "16"])
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    metrics = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert len(metrics) >= 2
    assert all(np.isfinite(m["loss"]) for m in metrics)
