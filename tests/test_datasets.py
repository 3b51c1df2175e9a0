"""Dataset pipeline on synthetic fixtures: AVQA/AVE samples through video
decode, audio windowing, fbank, tokenization, assembly, collation; plus the
strided eval sharding."""

import json
import os

import numpy as np
import pytest

from moka_tpu.data import assembler as asm
from moka_tpu.data.audio import segment_windows
from moka_tpu.data.datasets import (AVQA_INSTRUCTION, Tokenize,
                                    UnifiedDataset, llama2_chat_prompt)
from moka_tpu.eval.runner import batched, shard_indices


def toy_tokenizer():
    """Word-level tokenizer understanding the 11 special tokens."""
    vocab = {}
    t2i = {}
    base = 1000
    for i, t in enumerate(asm.SPECIAL_TOKENS):
        t2i[t] = base + i

    def encode(text):
        import re
        pattern = "(" + "|".join(re.escape(t) for t in asm.SPECIAL_TOKENS) \
            + ")"
        ids = []
        for piece in re.split(pattern, text):
            if not piece:
                continue
            if piece in t2i:
                ids.append(t2i[piece])
            else:
                for w in piece.split():
                    if w not in vocab:
                        vocab[w] = 3 + len(vocab) % 900
                    ids.append(vocab[w])
        return ids

    return Tokenize(encode=encode, token_to_id=t2i, pad_id=0, eos_id=2)


@pytest.fixture
def avqa_fixture(tmp_path):
    # synthetic video
    import cv2
    vid_path = str(tmp_path / "v.avi")
    w = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"MJPG"), 5,
                        (64, 64))
    rng = np.random.default_rng(0)
    for _ in range(20):
        w.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
    w.release()
    # synthetic 60s wav
    from scipy.io import wavfile
    wav_path = str(tmp_path / "a.wav")
    wavfile.write(wav_path, 16000,
                  (rng.standard_normal(16000 * 60) * 3000).astype(np.int16))
    ann = [{"video_id": "v1", "question_id": 7, "type": ["Audio", "Counting"],
            "video_path": vid_path, "audio_path": wav_path,
            "question": "how many instruments ?", "answer": "two",
            "label": "<answer>two</answer>"}]
    ann_path = str(tmp_path / "avqa.json")
    json.dump(ann, open(ann_path, "w"))
    return ann_path


def test_unified_dataset_avqa(avqa_fixture):
    tok = toy_tokenizer()
    ds = UnifiedDataset(tok, mode="train", avqa_annotation=avqa_fixture,
                        video_frame_nums=4, n_video_tokens=8,
                        n_audio_tokens=8)
    assert len(ds) == 1
    item = ds[0]
    assert item["video"].shape == (4, 3, 224, 224)
    assert item["audio"].shape == (10, 198, 128)  # 10 x 2s -> 198 frames
    assert item["instruction"].startswith("<s>[INST] <<SYS>>")
    assert "<question_start>Please answer this question" in item["instruction"]

    batch = ds.collate([item])
    L = batch["ids"].shape[1]
    assert batch["modality_masks"].shape == (3, 1, L)
    # 8 video + 8 audio feature slots
    assert batch["modality_masks"][1].sum() == 8
    assert batch["modality_masks"][2].sum() == 8
    assert batch["question_mask"].sum() > 0
    # labels supervised only on the output tokens
    n_sup = int((batch["labels"] != -100).sum())
    assert n_sup == len(tok.encode(item["output"]))


def test_qformer_question_conditioning_keys(avqa_fixture):
    """With a BERT-vocab tokenize, collate emits the static-shape question
    ids/mask consumed by the instruction-aware Q-Former path."""
    tok = toy_tokenizer()
    bert_vocab = {}

    def bert_tok(text):
        out = []
        for w in text.split():
            if w not in bert_vocab:
                bert_vocab[w] = 5 + len(bert_vocab)
            out.append(bert_vocab[w])
        return out

    ds = UnifiedDataset(tok, mode="train", avqa_annotation=avqa_fixture,
                        video_frame_nums=4, n_video_tokens=8,
                        n_audio_tokens=8, qformer_tokenize=bert_tok,
                        qformer_question_len=16)
    item = ds[0]
    assert item["question_text"] == "how many instruments ?"
    batch = ds.collate([item])
    assert batch["qformer_question_ids"].shape == (1, 16)
    assert batch["qformer_question_mask"].shape == (1, 16)
    n = len(bert_tok("how many instruments ?"))
    assert batch["qformer_question_mask"].sum() == n
    assert (batch["qformer_question_ids"][0, :n] > 0).all()
    assert (batch["qformer_question_ids"][0, n:] == 0).all()


def test_avqa_audio_windows_match_reference_arithmetic():
    """60s at 16k: windows at t=0,6,...,54; t=0 left-padded."""
    wav = np.arange(16000 * 60, dtype=np.float32)
    segs = segment_windows(wav, 60, 6, 0.5, 1.5)
    assert len(segs) == 10
    assert all(len(s) == 32000 for s in segs)
    # t=0: first 8000 samples are zero-pad
    assert (segs[0][:8000] == 0).all()
    assert segs[0][8000] == 0.0 and segs[0][8001] == 1.0
    # t=6: starts at 5.5s
    assert segs[1][0] == 16000 * 5.5


def test_ave_audio_windows():
    wav = np.ones(16000 * 10, np.float32)
    segs = segment_windows(wav, 10, 1, 0.0, 1.0)
    assert len(segs) == 10 and all(len(s) == 16000 for s in segs)


def test_chat_prompt_matches_reference_format():
    p = llama2_chat_prompt("Q")
    assert p == "<s>[INST] <<SYS>>\nYou are a helpful assistant.\n<</SYS>>\n\nQ [/INST]"


def test_shard_indices_no_duplicates():
    n, world = 23, 8
    all_idx = sum((shard_indices(n, r, world) for r in range(world)), [])
    assert sorted(all_idx) == list(range(n))
    assert len(list(batched(range(10), 4))) == 3


def test_unified_dataset_ave(tmp_path):
    """AVE task: label files, 10x1s audio windows, the fixed instruction."""
    import cv2
    from scipy.io import wavfile
    rng = np.random.default_rng(1)
    root = tmp_path / "ave"
    (root / "AVE").mkdir(parents=True)
    (root / "audio_data").mkdir()
    (root / "converted_label").mkdir()
    vid_path = str(root / "AVE" / "v1.avi")
    w = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"MJPG"), 5,
                        (64, 64))
    for _ in range(12):
        w.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
    w.release()
    wavfile.write(str(root / "audio_data" / "v1.wav"), 16000,
                  (rng.standard_normal(16000 * 10) * 3000).astype(np.int16))
    (root / "converted_label" / "v1.txt").write_text(
        "<event>Church bell</event><range>0,9</range>")
    ann = [{"vid": "v1", "event": "Church bell", "start_time": 0,
            "end_time": 9}]
    ann_path = str(tmp_path / "ave.json")
    json.dump(ann, open(ann_path, "w"))

    from moka_tpu.data.datasets import AVE_INSTRUCTION, UnifiedDataset
    tok = toy_tokenizer()
    ds = UnifiedDataset(tok, mode="train", ave_annotation=ann_path,
                        ave_data_root=str(root), video_frame_nums=4,
                        n_video_tokens=8, n_audio_tokens=8)
    assert len(ds) == 1
    item = ds[0]
    assert item["audio"].shape == (10, 98, 128)  # 10 x 1s -> 98 frames
    assert "Please describe the events and time range" in item["instruction"]
    assert item["output"].startswith("<event>Church bell</event>")
    batch = ds.collate([item])
    assert batch["modality_masks"][2].sum() == 8
