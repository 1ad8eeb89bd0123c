"""In-graph log-mel frontend (jittable, batched, length-masked).

The reference embeds preprocessing inside the ONNX graph ("raw audio
waveform; preprocessing is embedded in the ONNX graph" —
web/frontend/public/export_metadata.json model_notes.input). Spec constants
follow the NeMo-compatible frontend (reference: web/frontend/src/worker/
mel.ts:7-14): 16 kHz, 512-point FFT, 400 window / 160 hop, periodic Hann,
preemphasis 0.97, 80 HTK mel filters 0..8 kHz with Slaney normalization,
power spectrum, ln(mel + 1e-5), per-feature mean/std normalization over the
*valid* frames (dither omitted — the TPU build is deterministic by design,
replacing the reference's ±3-6-sample ONNX jitter apparatus with exact
regression tests; SURVEY.md §5.2).

Everything is expressed as framing + one [F, M] matmul so XLA maps the hot
work onto the MXU; the whole frontend fuses into the encoder under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 512
WIN_LENGTH = 400
HOP_LENGTH = 160
N_MELS = 80
PREEMPH = 0.97
LOG_GUARD = 1e-5
F_MIN = 0.0
F_MAX = 8000.0


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=4)
def mel_filterbank(
    n_mels: int = N_MELS,
    n_fft: int = N_FFT,
    sample_rate: int = SAMPLE_RATE,
    f_min: float = F_MIN,
    f_max: float = F_MAX,
) -> np.ndarray:
    """[n_freqs, n_mels] HTK-scale triangular filters, Slaney-normalized."""
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(hz_to_mel_htk(f_min), hz_to_mel_htk(f_max), n_mels + 2)
    hz_pts = mel_to_hz_htk(mel_pts)
    fb = np.zeros((n_freqs, n_mels), dtype=np.float64)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
        # Slaney normalization: 2 / bandwidth
        fb[:, m] *= 2.0 / (hi - lo)
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=2)
def hann_window(win_length: int = WIN_LENGTH) -> np.ndarray:
    """Periodic Hann window."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def num_frames(n_samples: int) -> int:
    """Frame count for center=False framing."""
    return max(0, 1 + (n_samples - WIN_LENGTH) // HOP_LENGTH)


def frames_for_length(length):
    """Traced variant of num_frames for int arrays/scalars."""
    return jnp.maximum(0, 1 + (length - WIN_LENGTH) // HOP_LENGTH)


@functools.partial(jax.jit, static_argnames=("eps",))
def log_mel_spectrogram(
    audio: jnp.ndarray,    # [B, N] float32
    lengths: jnp.ndarray,  # [B] int32 — valid sample counts
    eps: float = LOG_GUARD,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched waveform → normalized log-mel features.

    Returns (features [B, T, n_mels] float32, feat_lengths [B] int32).
    Frames beyond a sample's true length are zeroed; per-feature
    normalization statistics use only valid frames.
    """
    b, n = audio.shape
    t_frames = num_frames(n)

    # Preemphasis: y[0] = x[0], y[t] = x[t] - c*x[t-1].
    pre = jnp.concatenate([audio[:, :1], audio[:, 1:] - PREEMPH * audio[:, :-1]], axis=1)

    # Frame: [B, T, WIN]
    idx = (
        jnp.arange(t_frames)[:, None] * HOP_LENGTH + jnp.arange(WIN_LENGTH)[None, :]
    )
    frames = pre[:, idx]  # [B, T, WIN]
    frames = frames * jnp.asarray(hann_window())

    # Zero-padded FFT → power spectrum → mel (one MXU matmul).
    spec = jnp.fft.rfft(frames, n=N_FFT, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # [B, T, F]
    mel = jnp.einsum(
        "btf,fm->btm", power, jnp.asarray(mel_filterbank()),
        precision=jax.lax.Precision.HIGHEST,
    )
    logmel = jnp.log(mel + eps)

    # Valid-frame mask from true lengths.
    feat_lengths = frames_for_length(lengths).astype(jnp.int32)
    mask = (jnp.arange(t_frames)[None, :] < feat_lengths[:, None])[..., None]  # [B,T,1]

    # Per-feature normalization over valid frames only.
    cnt = jnp.maximum(feat_lengths[:, None, None].astype(logmel.dtype), 1.0)
    masked = jnp.where(mask, logmel, 0.0)
    mean = masked.sum(axis=1, keepdims=True) / cnt
    var = (jnp.where(mask, logmel - mean, 0.0) ** 2).sum(axis=1, keepdims=True) / cnt
    std = jnp.sqrt(var)
    normed = jnp.where(mask, (logmel - mean) / jnp.maximum(std, 1e-10), 0.0)
    return normed.astype(jnp.float32), feat_lengths
