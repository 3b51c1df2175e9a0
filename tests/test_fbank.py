"""fbank frontend: structural Kaldi properties + numpy/C++ cross-validation."""

import numpy as np
import pytest

from moka_tpu.data import fbank as fb
from moka_tpu.native import native_fbank


def test_frame_count_one_second():
    """1 s @ 16 kHz -> 98 frames (reference audio_processor docstring /
    SURVEY §2.10)."""
    wav = np.random.default_rng(0).standard_normal(16000)
    out = fb.fbank(wav * 2 ** 15)
    assert out.shape == (98, 128)


def test_pure_tone_peaks_at_right_mel_bin():
    sr = 16000
    t = np.arange(sr) / sr
    for hz in (440.0, 2000.0, 6000.0):
        wav = np.sin(2 * np.pi * hz * t) * 2 ** 14
        out = fb.fbank(wav)
        mean_spec = out.mean(0)
        peak_bin = int(mean_spec.argmax())
        # invert the expected mel bin
        banks = fb.mel_banks(128, 512, sr)
        centers = banks.argmax(1) * sr / 512
        assert abs(centers[peak_bin] - hz) < 300, (hz, centers[peak_bin])


def test_dc_offset_invariance():
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(8000) * 1000
    a = fb.fbank(wav)
    b = fb.fbank(wav + 12345.0)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_shift_alignment():
    """Frame k of x == frame 0 of x shifted by k*160 samples."""
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(16000) * 1000
    a = fb.fbank(wav)
    b = fb.fbank(wav[160 * 5:])
    np.testing.assert_allclose(a[5:], b[: len(a) - 5], rtol=1e-5, atol=1e-5)


def test_native_matches_numpy():
    lib = native_fbank(np.zeros(400, np.float32))
    if lib is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(16000) * 2 ** 14).astype(np.float32)
    a = fb.fbank(wav)
    b = native_fbank(wav)
    assert b is not None and b.shape == a.shape
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_beats_fbank_normalization():
    # beats_fbank rides the native (fp32) frontend when available; compare
    # against the numpy fp64 twin with an fp32-noise tolerance
    wav = np.random.default_rng(4).standard_normal(16000) * 0.1
    raw = fb.fbank(wav * 2 ** 15)
    norm = fb.beats_fbank(wav)
    np.testing.assert_allclose(norm, (raw - fb.FBANK_MEAN) /
                               (2 * fb.FBANK_STD), rtol=1e-4, atol=1e-5)
