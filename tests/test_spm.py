"""Standalone sentencepiece tokenizer.model reader (data/spm.py).

sentencepiece isn't in the image, so the test serializes a tiny ModelProto
by hand (the wire format is ~10 lines) and checks both inference
algorithms, byte fallback, special-token splitting, and that added
multimodal token ids line up with the resized-checkpoint convention
(appended after the base vocab — ``unified_arch.py:351-377``).
"""

import struct

import pytest

from moka_tpu.data.spm import BYTE, CONTROL, NORMAL, UNKNOWN, SPModel


# ---------------------------------------------------------- proto serializer

def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        out += bytes([b | (0x80 if n else 0)])
        if not n:
            return out


def _ld(field: int, payload: bytes) -> bytes:  # length-delimited
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vi(field: int, val: int) -> bytes:  # varint field
    return _varint(field << 3) + _varint(val)


def _f32(field: int, val: float) -> bytes:  # 32-bit float field
    return _varint((field << 3) | 5) + struct.pack("<f", val)


def _piece(piece: str, score: float, typ: int) -> bytes:
    msg = _ld(1, piece.encode()) + _f32(2, score) + _vi(3, typ)
    return _ld(1, msg)


def _model(pieces, model_type=2, add_dummy_prefix=True) -> bytes:
    blob = b"".join(_piece(*p) for p in pieces)
    blob += _ld(2, _vi(3, model_type))                 # TrainerSpec
    blob += _ld(3, _vi(3, int(add_dummy_prefix)))      # NormalizerSpec
    return blob


W = "▁"  # sentencepiece whitespace marker

BPE_PIECES = [
    ("<unk>", 0.0, UNKNOWN),
    ("<s>", 0.0, CONTROL),
    ("</s>", 0.0, CONTROL),
    ("<0x7A>", 0.0, BYTE),          # 'z'
    ("<0x21>", 0.0, BYTE),          # '!'
    (W, -4.0, NORMAL),
    ("h", -10.0, NORMAL), ("o", -10.0, NORMAL), ("w", -10.0, NORMAL),
    ("m", -10.0, NORMAL), ("a", -10.0, NORMAL), ("n", -10.0, NORMAL),
    ("y", -10.0, NORMAL),
    (W + "h", -1.0, NORMAL),
    (W + "ho", -1.5, NORMAL),
    (W + "how", -0.5, NORMAL),
    ("ho", -2.0, NORMAL),
    ("ow", -3.0, NORMAL),
    (W + "m", -1.0, NORMAL),
    (W + "ma", -1.5, NORMAL),
    (W + "man", -1.2, NORMAL),
    (W + "many", -0.6, NORMAL),
]


@pytest.fixture
def bpe_model(tmp_path):
    path = tmp_path / "tokenizer.model"
    path.write_bytes(_model(BPE_PIECES, model_type=2))
    return str(path)


def _pid(name):
    return next(i for i, p in enumerate(BPE_PIECES) if p[0] == name)


def test_bpe_greedy_merge(bpe_model):
    m = SPModel.from_file(bpe_model)
    assert m.model_type == 2 and m.add_dummy_prefix
    # "how" -> dummy prefix -> ▁how; merges ▁h (best −1), ▁ho, ▁how
    assert m.encode_segment("how") == [_pid(W + "how")]
    assert m.encode_segment("how many") == [_pid(W + "how"),
                                            _pid(W + "many")]


def test_byte_fallback(bpe_model):
    m = SPModel.from_file(bpe_model)
    ids = m.encode_segment("z!")
    assert ids[-2:] == [_pid("<0x7A>"), _pid("<0x21>")]
    assert m.decode_ids(ids) == "z!"


def test_decode_roundtrip(bpe_model):
    m = SPModel.from_file(bpe_model)
    assert m.decode_ids(m.encode_segment("how many")) == "how many"


def test_special_token_splitting(bpe_model):
    from moka_tpu.data.spm import SPTokenizer
    m = SPModel.from_file(bpe_model)
    tok = SPTokenizer(m)
    base = len(BPE_PIECES)
    tok.add_special_tokens(["<image>", "<question_start>"])
    assert tok.token_to_id("<image>") == base
    assert tok.token_to_id("<question_start>") == base + 1
    ids = tok.encode("<s>how<image>many").ids
    assert ids == [_pid("<s>"), _pid(W + "how"), base, _pid(W + "many")]
    # decode keeps the markers, skip_special_tokens drops them
    assert "<image>" in tok.decode(ids)
    assert "<image>" not in tok.decode(ids, skip_special_tokens=True)


def test_load_tokenizer_model_file(bpe_model):
    """load_tokenizer accepts tokenizer.model; the 11 multimodal specials
    land at base..base+10, the resized-checkpoint id convention."""
    from moka_tpu.data.assembler import SPECIAL_TOKENS
    from moka_tpu.data.tokenizer import load_tokenizer

    tok = load_tokenizer(bpe_model)
    base = len(BPE_PIECES)
    assert tok.vocab_size == base + len(SPECIAL_TOKENS)
    assert [tok.token_to_id[t] for t in SPECIAL_TOKENS] == \
        list(range(base, base + len(SPECIAL_TOKENS)))
    assert tok.eos_id == 2
    ids = tok.encode("how <video> many")
    assert tok.token_to_id["<video>"] in ids


def test_load_tokenizer_dir_prefers_json(tmp_path, bpe_model):
    """A dir with both files resolves tokenizer.json first (AutoTokenizer
    fast-first), and one with only tokenizer.model falls back to spm."""
    import shutil
    from moka_tpu.data.tokenizer import load_tokenizer

    d = tmp_path / "model_dir"
    d.mkdir()
    shutil.copy(bpe_model, d / "tokenizer.model")
    tok = load_tokenizer(str(d))
    assert tok.encode("how") == [_pid(W + "how")]


def test_unigram_viterbi(tmp_path):
    """model_type=1: Viterbi picks the best-scoring segmentation, not the
    greedy longest match."""
    pieces = [
        ("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
        ("</s>", 0.0, CONTROL),
        (W, -2.0, NORMAL),
        (W + "ab", -6.0, NORMAL),   # greedy longest-first would take this
        ("c", -1.0, NORMAL),
        (W + "a", -1.0, NORMAL),
        ("bc", -1.0, NORMAL),
        ("b", -4.0, NORMAL),
    ]
    path = tmp_path / "uni.model"
    path.write_bytes(_model(pieces, model_type=1))
    m = SPModel.from_file(path)
    # ▁abc: ▁a + bc (−2) beats ▁ab + c (−7)
    assert m.encode_segment("abc") == [6, 7]
    assert m.decode_ids([6, 7]) == "abc"
