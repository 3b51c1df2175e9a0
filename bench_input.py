"""Host input-pipeline throughput: can the CPU side feed the chip?

The reference's own hot loop is the CPU dataloader (SURVEY §3.1: decord +
kaldi-fbank inside ``unified_dataset.py.__getitem__``); every device bench in
this repo feeds random tensors, so this one measures the REAL AVQA-shaped
path end to end on the host: cv2 video decode (10 uniform frames from a 60 s
clip) -> CLIP preprocess -> wav read -> 10 fbank segments (C++ frontend) ->
tokenize -> assemble -> ``ParallelLoader`` (threaded __getitem__ + collate +
prefetch).

The device side consumes ~4.3 samples/s/chip at the multimodal flagship
(4,434 tok/s at b4xL1024, BENCH_r03 avt_7b_int4a8f_qh); an input-bound
trainer would silently void that headline, so the bench reports the
host/device ratio.  Synthetic fixtures (MJPG 640x360@24fps 60 s video, 60 s
wav) are cached under /tmp; all samples share the two files, so filesystem
IO is page-cache-warm — the number measures decode/DSP/assembly CPU cost,
which is the regime of a real run too (the OS caches hot shards).

Prints one JSON line.  ``python bench_input.py [--samples N]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

FIXDIR = "/tmp/moka_bench_input"
VIDEO_W, VIDEO_H, VIDEO_FPS, VIDEO_SECONDS = 640, 360, 24, 60
DEVICE_SAMPLES_PER_SEC = 4.33  # flagship multimodal step, b4xL1024 (r3)


def _fixtures() -> tuple[str, str]:
    """Synthesize (once) a 60 s MJPG video + 60 s wav like MUSIC-AVQA's."""
    os.makedirs(FIXDIR, exist_ok=True)
    vid = os.path.join(FIXDIR, "clip.avi")
    wav = os.path.join(FIXDIR, "clip.wav")
    if not os.path.exists(vid):
        import cv2
        rng = np.random.default_rng(0)
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), VIDEO_FPS,
                            (VIDEO_W, VIDEO_H))
        # structured frames (JPEG-compressible like real footage, not noise)
        yy, xx = np.mgrid[0:VIDEO_H, 0:VIDEO_W].astype(np.float32)
        for t in range(VIDEO_FPS * VIDEO_SECONDS):
            img = (127 + 120 * np.sin(xx / 40 + t / 7) *
                   np.cos(yy / 30 - t / 11)).astype(np.uint8)
            frame = np.stack([img, np.roll(img, t % 50, 0),
                              np.roll(img, t % 91, 1)], -1)
            w.write(frame)
        w.release()
    if not os.path.exists(wav):
        from scipy.io import wavfile
        rng = np.random.default_rng(1)
        wavfile.write(wav, 16000, (rng.standard_normal(16000 * 60) * 3000)
                      .astype(np.int16))
    return vid, wav


def _tokenize():
    from tokenizers import Tokenizer, models, pre_tokenizers

    from moka_tpu.data.datasets import Tokenize
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
    for w in ("this is a video audio please answer the question how many "
              "instruments two [INST] [/INST] <<SYS>> you are helpful "
              "assistant . : ? <answer> </answer>").split():
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    path = os.path.join(FIXDIR, "tokenizer.json")
    tok.save(path)
    from moka_tpu.data.tokenizer import load_tokenizer
    return load_tokenizer(path).as_tokenize()


def main(n_samples: int = 64, batch: int = 4, pad_to: int = 1024,
         workers_sweep=(1, 4, 8, 16)):
    from moka_tpu.data.datasets import UnifiedDataset
    from moka_tpu.data.prefetch import ParallelLoader

    vid, wav = _fixtures()
    ann = [{"video_id": f"v{i}", "question_id": i,
            "type": ["Audio", "Counting"], "video_path": vid,
            "audio_path": wav, "question": "how many instruments ?",
            "answer": "two", "label": "<answer> two </answer>"}
           for i in range(n_samples)]
    ann_path = os.path.join(FIXDIR, "avqa.json")
    json.dump(ann, open(ann_path, "w"))

    ds = UnifiedDataset(_tokenize(), mode="train", avqa_annotation=ann_path,
                        video_frame_nums=10, image_size=224,
                        n_video_tokens=320, n_audio_tokens=320)

    # warm the page cache + any lazy native build outside the timed region
    ds[0]

    results = {}
    for nw in workers_sweep:
        loader = ParallelLoader(ds, collate=lambda b: ds.collate(
            b, pad_to=pad_to), batch_size=batch, workers=nw,
            prefetch_batches=2)
        t0 = time.perf_counter()
        n_batches = 0
        for b in loader.epoch(np.arange(n_samples)):
            assert b["video"].shape[0] == batch
            n_batches += 1
        dt = time.perf_counter() - t0
        sps = n_batches * batch / dt
        results[f"workers_{nw}"] = {"samples_per_sec": round(sps, 2),
                                    "wall_s": round(dt, 2)}

    best = max(v["samples_per_sec"] for v in results.values())
    print(json.dumps({
        "metric": "input_pipeline_samples_per_sec",
        "value": best,
        "unit": "samples/s",
        "detail": {
            "n_samples": n_samples, "batch": batch, "pad_to": pad_to,
            "video": f"{VIDEO_W}x{VIDEO_H}@{VIDEO_FPS}fps {VIDEO_SECONDS}s "
                     "MJPG, 10 uniform frames",
            "audio": "60s wav -> 10 x 2s fbank segments (C++ frontend)",
            "device_demand_samples_per_sec": DEVICE_SAMPLES_PER_SEC,
            "host_over_device_ratio": round(best / DEVICE_SAMPLES_PER_SEC, 2),
            **results,
        },
    }))


if __name__ == "__main__":
    n = int(sys.argv[sys.argv.index("--samples") + 1]) \
        if "--samples" in sys.argv else 64
    main(n_samples=n)
