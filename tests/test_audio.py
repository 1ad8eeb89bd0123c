"""Audio IO: wav parser, native compressed-format decoder, resampling.

Reference parity: shared/audio.py:8-18 (librosa decode → f32 mono 16 kHz);
the mp3/m4a corpus clips (benchmark/test_corpus) exercised the librosa→
ffmpeg path there, and the native audiodec.cpp path here.
"""

import numpy as np
import pytest

from tilawa_tpu.data.audio import (
    TARGET_SR,
    load_audio,
    resample,
    save_wav,
    speed_perturb,
)
from pathlib import Path

CORPUS = Path(__file__).resolve().parent.parent / "benchmark" / "test_corpus"


def test_wav_round_trip(tmp_path):
    t = np.arange(16000) / 16000.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "tone.wav"
    save_wav(p, x)
    y = load_audio(p)
    assert y.shape == x.shape
    assert np.abs(y - x).max() < 2e-4  # 16-bit quantization


def test_resample_preserves_tone():
    t = np.arange(48000) / 48000.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, 48000, 16000)
    assert abs(len(y) - 16000) <= 2
    # Dominant FFT bin still at 440 Hz.
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * 16000 / len(y)
    assert abs(peak_hz - 440) < 5


def test_speed_perturb_changes_duration():
    x = np.random.default_rng(0).normal(size=32000).astype(np.float32)
    a = speed_perturb(x, 1.1)
    b = speed_perturb(x, 0.9)
    assert abs(len(a) - len(x) * 1.1) < 100
    assert abs(len(b) - len(x) * 0.9) < 100


@pytest.mark.parametrize("fname", ["001001.mp3", "112001.mp3"])
def test_native_mp3_decode(fname):
    path = CORPUS / fname
    if not path.exists():
        pytest.skip("corpus clip not present")
    audio = load_audio(path)
    assert audio.dtype == np.float32
    assert audio.ndim == 1
    assert len(audio) > TARGET_SR  # > 1 s of real speech
    rms = float(np.sqrt((audio**2).mean()))
    assert 0.01 < rms < 1.0


def test_native_m4a_decode():
    path = CORPUS / "ikhlas_2_3.m4a"
    if not path.exists():
        pytest.skip("corpus clip not present")
    audio = load_audio(path)
    assert len(audio) > 5 * TARGET_SR
    assert 0.005 < float(np.sqrt((audio**2).mean())) < 1.0


def test_native_decode_deterministic():
    path = CORPUS / "112001.mp3"
    if not path.exists():
        pytest.skip("corpus clip not present")
    a = load_audio(path)
    b = load_audio(path)
    assert np.array_equal(a, b)
