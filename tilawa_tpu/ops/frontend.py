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


# ---------------------------------------------------------------------------
# Fused Pallas frontend: framing + windowed DFT + power + mel + log in ONE
# kernel. On the MXU a dense DFT-as-matmul beats an FFT at WIN=400 (two
# [TT,400]x[400,F] matmuls), and fusing keeps the [T, F] power spectrum out
# of HBM entirely — only the [T, 80] log-mels are ever written back.
# ---------------------------------------------------------------------------

_TT = 128                       # frames per grid tile
_F_PAD = 384                    # 257 rfft bins padded to a lane multiple
# 160-sample hop rows, zero-padded to 256 lanes so every DMA slice and
# matmul operand is (8, 128)-tile aligned; TT+2 rows cover TT overlapping
# frames, rounded up to the 8-row sublane tile.
_ROW_PAD = 256
_CHUNK_ROWS = _TT + 8


@functools.lru_cache(maxsize=2)
def _dft_matrices(eps_unused: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT matrices as three stacked [ROW_PAD, F_PAD] blocks
    ([3*ROW_PAD, F_PAD] total): block r holds DFT rows for window samples
    [r*HOP, min((r*HOP)+ROW_PAD, WIN)), zero elsewhere, with the Hann
    window folded in — so frames @ DFT decomposes into three full-width
    aligned matmuls against consecutive hop rows."""
    n_freqs = N_FFT // 2 + 1
    t = np.arange(WIN_LENGTH, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * t * k / N_FFT
    win = hann_window().astype(np.float64)[:, None]
    real_full = (win * np.cos(ang)).astype(np.float32)   # [WIN, n_freqs]
    imag_full = (win * np.sin(ang)).astype(np.float32)
    real = np.zeros((3 * _ROW_PAD, _F_PAD), dtype=np.float32)
    imag = np.zeros((3 * _ROW_PAD, _F_PAD), dtype=np.float32)
    for r in range(3):
        lo = r * HOP_LENGTH
        hi = min(lo + HOP_LENGTH, WIN_LENGTH)
        real[r * _ROW_PAD : r * _ROW_PAD + (hi - lo), :n_freqs] = real_full[lo:hi]
        imag[r * _ROW_PAD : r * _ROW_PAD + (hi - lo), :n_freqs] = imag_full[lo:hi]
    return real, imag


@functools.lru_cache(maxsize=2)
def _fb_padded() -> np.ndarray:
    fb = mel_filterbank()
    out = np.zeros((_F_PAD, N_MELS), dtype=np.float32)
    out[: fb.shape[0]] = fb
    return out


def _mel_kernel(audio_ref, dftr_ref, dfti_ref, fb_ref, out_ref, scratch, sem,
                *, eps: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    # audio arrives pre-reshaped as [B, rows, 160] so the DMA and all kernel
    # math stay 2D (Mosaic cannot shape-cast 1D vectors to 2D).
    dma = pltpu.make_async_copy(
        audio_ref.at[b, pl.ds(i * _TT, _CHUNK_ROWS), :], scratch, sem
    )
    dma.start()
    dma.wait()
    rows = scratch[:]  # [CHUNK_ROWS, ROW_PAD], only the first 160 lanes live
    # WIN = 400 = 160 + 160 + 80: frame t = rows[t] ++ rows[t+1] ++ rows[t+2][:80].
    # Frames are never materialized (Mosaic can't concat offset-shifted
    # slices); instead the DFT matmul splits over three row-shifted blocks
    # against the zero-padded DFT block matrices:
    #   frames @ D == rows[t] @ D0 + rows[t+1] @ D1 + rows[t+2] @ D2

    # HIGHEST matmul precision: the power spectrum spans a huge dynamic
    # range and ln() amplifies relative error at small magnitudes — single-
    # pass bf16 MXU products drift the normalized features by ~0.5.
    hp = jax.lax.Precision.HIGHEST

    def dft(mat_ref):
        return (
            jnp.dot(rows[0:_TT], mat_ref[0:_ROW_PAD],
                    preferred_element_type=jnp.float32, precision=hp)
            + jnp.dot(rows[1:_TT + 1], mat_ref[_ROW_PAD:2 * _ROW_PAD],
                      preferred_element_type=jnp.float32, precision=hp)
            + jnp.dot(rows[2:_TT + 2], mat_ref[2 * _ROW_PAD:],
                      preferred_element_type=jnp.float32, precision=hp)
        )

    real = dft(dftr_ref)
    imag = dft(dfti_ref)
    power = real * real + imag * imag           # [TT, F_PAD]
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32,
                  precision=hp)
    out_ref[0] = jnp.log(mel + eps)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_log_mel(
    pre: jnp.ndarray, eps: float = LOG_GUARD, interpret: bool = False
) -> jnp.ndarray:
    """Pre-emphasized waveform [B, N] → log-mels [B, T, 80] via the fused
    Pallas kernel (normalization stays outside; it needs true lengths)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = pre.shape
    t_frames = num_frames(n)
    t_tiles = max(1, -(-t_frames // _TT))
    rows_total = (t_tiles - 1) * _TT + _CHUNK_ROWS
    n_need = rows_total * HOP_LENGTH
    if n_need > n:
        pre = jnp.pad(pre, ((0, 0), (0, n_need - n)))
    pre = pre[:, :n_need].reshape(b, rows_total, HOP_LENGTH)
    pre = jnp.pad(pre, ((0, 0), (0, 0), (0, _ROW_PAD - HOP_LENGTH)))
    dftr, dfti = _dft_matrices()
    out = pl.pallas_call(
        functools.partial(_mel_kernel, eps=eps),
        grid=(b, t_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _TT, N_MELS), lambda bb, ii: (bb, ii, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_tiles * _TT, N_MELS), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_CHUNK_ROWS, _ROW_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_tiles * _TT * WIN_LENGTH * _F_PAD * 2
            + 2 * b * t_tiles * _TT * _F_PAD * N_MELS,
            bytes_accessed=pre.size * 4 + b * t_tiles * _TT * N_MELS * 4,
            transcendentals=b * t_tiles * _TT * N_MELS,
        ),
        interpret=interpret,
    )(pre, jnp.asarray(dftr), jnp.asarray(dfti), jnp.asarray(_fb_padded()))
    return out[:, :t_frames]


@functools.partial(jax.jit, static_argnames=("eps", "use_pallas"))
def log_mel_spectrogram(
    audio: jnp.ndarray,    # [B, N] float32
    lengths: jnp.ndarray,  # [B] int32 — valid sample counts
    eps: float = LOG_GUARD,
    use_pallas: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched waveform → normalized log-mel features.

    Returns (features [B, T, n_mels] float32, feat_lengths [B] int32).
    Frames beyond a sample's true length are zeroed; per-feature
    normalization statistics use only valid frames. use_pallas=True routes
    framing+DFT+power+mel+log through the fused kernel above.
    """
    b, n = audio.shape
    t_frames = num_frames(n)

    # Preemphasis: y[0] = x[0], y[t] = x[t] - c*x[t-1].
    pre = jnp.concatenate([audio[:, :1], audio[:, 1:] - PREEMPH * audio[:, :-1]], axis=1)

    if use_pallas:
        logmel = fused_log_mel(pre, eps=eps)
    else:
        # Frame: [B, T, WIN]
        idx = (
            jnp.arange(t_frames)[:, None] * HOP_LENGTH
            + jnp.arange(WIN_LENGTH)[None, :]
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
