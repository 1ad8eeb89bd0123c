"""Frontend numerics vs an independent NumPy STFT reference."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tilawa_tpu.ops.frontend import (  # noqa: E402

    HOP_LENGTH,
    N_FFT,
    WIN_LENGTH,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    num_frames,
)

pytestmark = pytest.mark.slow


def numpy_logmel(audio: np.ndarray) -> np.ndarray:
    """Straight-line NumPy implementation of the same spec."""
    pre = np.concatenate([audio[:1], audio[1:] - 0.97 * audio[:-1]])
    t = num_frames(len(audio))
    win = hann_window()
    frames = np.stack(
        [pre[i * HOP_LENGTH : i * HOP_LENGTH + WIN_LENGTH] * win for i in range(t)]
    )
    spec = np.fft.rfft(frames, n=N_FFT, axis=-1)
    power = np.abs(spec) ** 2
    mel = power @ mel_filterbank().astype(np.float64)
    logmel = np.log(mel + 1e-5)
    mean = logmel.mean(axis=0, keepdims=True)
    std = logmel.std(axis=0, keepdims=True)
    return (logmel - mean) / np.maximum(std, 1e-10)


def test_matches_numpy_reference():
    rng = np.random.default_rng(0)
    audio = rng.normal(scale=0.1, size=16000).astype(np.float32)
    ours, lens = log_mel_spectrogram(
        jnp.array(audio[None]), jnp.array([len(audio)], dtype=jnp.int32)
    )
    ref = numpy_logmel(audio)
    assert ours.shape == (1, ref.shape[0], 80)
    assert int(lens[0]) == ref.shape[0]
    np.testing.assert_allclose(np.asarray(ours[0]), ref, atol=2e-3)


def test_padding_invariance():
    """Features for the valid region must not change when the batch is
    padded with extra samples (the batching-exactness contract)."""
    rng = np.random.default_rng(1)
    audio = rng.normal(scale=0.1, size=8000).astype(np.float32)
    n_pad = 16000
    padded = np.zeros(n_pad, dtype=np.float32)
    padded[:8000] = audio

    a, la = log_mel_spectrogram(
        jnp.array(audio[None]), jnp.array([8000], dtype=jnp.int32)
    )
    b, lb = log_mel_spectrogram(
        jnp.array(padded[None]), jnp.array([8000], dtype=jnp.int32)
    )
    t = int(la[0])
    assert int(lb[0]) == t
    np.testing.assert_allclose(np.asarray(a[0, :t]), np.asarray(b[0, :t]), atol=1e-5)
    # padded frames are zeroed
    assert np.abs(np.asarray(b[0, t:])).max() == 0.0


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank()
    assert fb.shape == (257, 80)
    assert (fb >= 0).all()
    assert (fb.sum(axis=0) > 0).all()  # every filter has support


class TestFusedPallasMel:
    def test_matches_xla_path(self):
        """Fused kernel (interpret mode) vs the rfft XLA path."""
        import numpy as np
        import jax.numpy as jnp
        from tilawa_tpu.ops.frontend import (
            LOG_GUARD, PREEMPH, fused_log_mel, log_mel_spectrogram,
        )

        rng = np.random.default_rng(0)
        audio = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
        lengths = jnp.array([16000, 12000], jnp.int32)

        ref_feats, ref_lens = log_mel_spectrogram(
            jnp.asarray(audio), lengths, use_pallas=False
        )
        a = jnp.asarray(audio)
        pre = jnp.concatenate(
            [a[:, :1], a[:, 1:] - PREEMPH * a[:, :-1]], axis=1
        )
        logmel = np.asarray(fused_log_mel(pre, eps=LOG_GUARD, interpret=True))

        # reconstruct the unnormalized reference log-mels for comparison
        import jax
        from tilawa_tpu.ops.frontend import (
            N_FFT, WIN_LENGTH, HOP_LENGTH, hann_window, mel_filterbank,
            num_frames,
        )
        t = num_frames(16000)
        idx = (
            np.arange(t)[:, None] * HOP_LENGTH + np.arange(WIN_LENGTH)[None, :]
        )
        frames = np.asarray(pre)[:, idx] * hann_window()
        spec = np.fft.rfft(frames, n=N_FFT, axis=-1)
        power = spec.real ** 2 + spec.imag ** 2
        ref_logmel = np.log(power @ mel_filterbank() + LOG_GUARD)

        assert logmel.shape == ref_logmel.shape
        np.testing.assert_allclose(logmel, ref_logmel, atol=2e-3, rtol=2e-3)
