"""Runnable end-to-end walkthrough on synthetic data (CPU-friendly).

Builds a toy tokenizer + synthetic video/audio + MUSIC-AVQA-style
annotation, fine-tunes the tiny tri-modal MokA model for a few steps with
the real CLI driver, then runs batched inference and the AVQA scorer over
the produced artifacts.  This is the same flow as production, minus the
real LLaMA/CLIP/BEATs checkpoints (see TODO.md):

    python examples/tiny_end_to_end.py /tmp/moka_example
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_world(root):
    from tokenizers import Tokenizer, models, pre_tokenizers
    import cv2
    from scipy.io import wavfile

    os.makedirs(root, exist_ok=True)
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
    words = ("this is a video audio please answer the question how many "
             "instruments two [INST] [/INST] <<SYS>> you are helpful "
             "assistant . : ? <answer> </answer>").split()
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok_path = os.path.join(root, "tokenizer.json")
    tok.save(tok_path)

    rng = np.random.default_rng(0)
    vid = os.path.join(root, "v.avi")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 5, (64, 64))
    for _ in range(16):
        w.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
    w.release()
    wav = os.path.join(root, "a.wav")
    wavfile.write(wav, 16000,
                  (rng.standard_normal(16000 * 60) * 3000).astype(np.int16))
    ann = [{"video_id": f"v{i}", "question_id": i,
            "type": ["Audio", "Counting"], "video_path": vid,
            "audio_path": wav, "question": "how many instruments ?",
            "answer": "two", "label": "<answer> two </answer>"}
           for i in range(4)]
    ann_path = os.path.join(root, "avqa.json")
    json.dump(ann, open(ann_path, "w"))
    return tok_path, ann_path


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    tok_path, ann_path = build_world(root)
    run_dir = os.path.join(root, "run")

    from moka_tpu.cli.finetune import main as finetune
    finetune(["--tokenizer-json", tok_path, "--avqa-annotation", ann_path,
              "--output-dir", run_dir, "--model-preset", "tiny",
              "--global-batch", "2", "--epochs", "1", "--pad-to", "128",
              "--learning-rate", "1e-3"])

    from moka_tpu.cli.infer import main as infer
    infer(["--tokenizer-json", tok_path, "--annotation", ann_path,
           "--adapter-ckpt", os.path.join(run_dir, "adapter_model.bin"),
           "--non-lora-ckpt",
           os.path.join(run_dir, "non_lora_trainables.bin"),
           "--output-dir", os.path.join(run_dir, "infer"),
           "--model-preset", "tiny", "--task", "avqa",
           "--batch-size", "2", "--max-new-tokens", "4",
           "--pad-to", "128"])

    from moka_tpu.eval.scorers.avqa import score_file
    shard = os.path.join(run_dir, "infer", "result_rank0_avqa.jsonl")
    print(json.dumps(score_file(shard), indent=2))
    print(f"artifacts in {run_dir}")


if __name__ == "__main__":
    main()
