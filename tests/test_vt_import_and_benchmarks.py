"""VT importer round-trip + benchmark dataset construction on synthetic
fixtures."""

import base64
import io
import json

import numpy as np
import jax
import pytest

from moka_tpu.core.config import LlamaConfig
from moka_tpu.models import llama
from moka_tpu.ops.moka import MokaSpec
from moka_tpu.train import import_torch as imp

CFG = LlamaConfig.tiny(vocab_size=64)
SPEC = MokaSpec.vt(rank=4, dropout_rate=0.0)


def test_vt_adapter_import():
    rng = np.random.default_rng(0)
    sd = {}
    group = {"q": "self_attn.q_proj", "gate": "mlp.gate_proj"}
    want = {}
    for layer in range(CFG.n_layers):
        for name, mod in group.items():
            d_in = CFG.dim if name == "q" else CFG.dim
            d_out = CFG.dim if name == "q" else CFG.intermediate
            base = f"base_model.model.language_model.model.layers.{layer}.{mod}"
            at = rng.standard_normal((4, d_in)).astype(np.float32)
            ai = rng.standard_normal((4, d_in)).astype(np.float32)
            bt = rng.standard_normal((d_out, 4)).astype(np.float32)
            sd[f"{base}.lora_A.text.weight"] = at
            sd[f"{base}.lora_A.image.weight"] = ai
            sd[f"{base}.lora_B.text.weight"] = bt
            want[(layer, name)] = (at.T, ai.T, bt.T)
    out = imp.import_moka_adapters_vt(sd, CFG, rank=4)
    for (layer, name), (at, ai, bt) in want.items():
        np.testing.assert_allclose(
            np.asarray(out["layers"][name]["a"][layer, 0]), at)
        np.testing.assert_allclose(
            np.asarray(out["layers"][name]["a"][layer, 1]), ai)
        np.testing.assert_allclose(
            np.asarray(out["layers"][name]["b"][layer]), bt)
    # untouched targets remain zero
    assert float(np.abs(np.asarray(out["layers"]["up"]["a"])).sum()) == 0


@pytest.fixture
def mmbench_tsv(tmp_path):
    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", (32, 32), (120, 30, 200)).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    rows = ["index\tquestion\tanswer\timage\tA\tB\thint"]
    rows.append(f"0\tWhat color?\tA\t{b64}\tpurple\tgreen\tLook closely")
    rows.append(f"1\tWhat shape?\tB\t{b64}\tsquare\tcircle\t")
    path = tmp_path / "mmbench.tsv"
    path.write_text("\n".join(rows))
    return str(path)


def test_mmbench_dataset_and_eval_batch(mmbench_tsv):
    from moka_tpu.data.benchmarks import MMBenchDataset, build_eval_batch
    from tests.test_datasets import toy_tokenizer
    ds = MMBenchDataset(mmbench_tsv)
    assert len(ds) == 2
    it = ds[0]
    assert "Hint: Look closely" in it["prompt"]
    assert "(A) purple" in it["prompt"] and "(B) green" in it["prompt"]
    assert "<image_start><image><image_end>" in it["prompt"]
    assert it["image"].shape == (3, 224, 224)

    tok = toy_tokenizer()
    batch = build_eval_batch([ds[0], ds[1]], tok, num_image_tokens=4)
    assert batch["pixel_values"].shape == (2, 3, 224, 224)
    assert batch["image_pos"].shape == (2, 4)
    assert batch["image_mask"].sum() == 8
    # left-padded: attention ends at the last column
    assert (batch["attn_mask"][:, -1] == 1).all()


def test_mme_dataset(tmp_path):
    from PIL import Image
    sub = tmp_path / "existence"
    sub.mkdir()
    Image.new("RGB", (16, 16)).save(sub / "img1.jpg")
    (sub / "img1.txt").write_text(
        "Is there a dog in the image? Please answer yes or no. Yes\n"
        "Is there a cat in the image? Please answer yes or no. No\n")
    from moka_tpu.data.benchmarks import MMEDataset
    ds = MMEDataset(str(tmp_path))
    assert len(ds) == 2
    assert ds[0]["answer"] == "Yes"
    assert ds[0]["meta"]["subtask"] == "existence"
    assert "yes or no" in ds[0]["prompt"]


def test_seed_dataset(tmp_path):
    from PIL import Image
    (tmp_path / "imgs").mkdir()
    Image.new("RGB", (16, 16)).save(tmp_path / "imgs" / "x.png")
    data = {"questions": [{"question": "What?", "answer": "A",
                           "choice_a": "1", "choice_b": "2", "choice_c": "3",
                           "choice_d": "4", "data_id": "x.png"}]}
    (tmp_path / "seed.json").write_text(json.dumps(data))
    from moka_tpu.data.benchmarks import SEEDDataset
    ds = SEEDDataset(str(tmp_path / "seed.json"), str(tmp_path / "imgs"))
    it = ds[0]
    assert "(A) 1" in it["prompt"] and "(D) 4" in it["prompt"]


def test_eval_vt_cli_seed_scored_in_one_invocation(tmp_path):
    """VERDICT r1 item 8: cli/eval_vt.py on a synthetic SEED dataset
    produces per-rank shards AND the merged scored JSON in one invocation
    (auto-merge + host barrier + scorer), tiny random-init model."""
    import os
    from PIL import Image
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
    words = ("this is an image question what color options answer with "
             "the option letter ( ) a b c d 1 2 3 4 : . ▁").split()
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok_path = str(tmp_path / "tokenizer.json")
    tok.save(tok_path)

    (tmp_path / "imgs").mkdir()
    qs = []
    for i in range(4):
        Image.new("RGB", (32, 32), color=(i * 50, 0, 0)).save(
            tmp_path / "imgs" / f"img{i}.png")
        qs.append({"question": "what color", "answer": "ABCD"[i % 4],
                   "choice_a": "1", "choice_b": "2", "choice_c": "3",
                   "choice_d": "4", "data_id": f"img{i}.png"})
    seed_json = str(tmp_path / "seed.json")
    with open(seed_json, "w") as f:
        json.dump({"questions": qs}, f)

    from moka_tpu.cli.eval_vt import main
    out_dir = str(tmp_path / "out")
    main(["--task", "seed", "--tokenizer-json", tok_path,
          "--data", seed_json, "--image-root", str(tmp_path / "imgs"),
          "--output-dir", out_dir, "--model-preset", "tiny",
          "--batch-size", "2", "--pad-to", "128", "--max-new-tokens", "3"])

    assert os.path.exists(os.path.join(out_dir, "result_rank0_seed.jsonl"))
    scores = json.load(open(os.path.join(out_dir, "scores_seed.json")))
    assert "accuracy" in scores and 0.0 <= scores["accuracy"] <= 1.0
    assert scores["total"] == 4
