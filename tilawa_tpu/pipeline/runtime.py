"""Acoustic runtime: jitted, bucket-padded encoder forwards on the device.

Plays the role of the reference's ONNX Runtime session (reference:
experiments/c2c-direct-mixed/run.py:37-63 — session.run on
audio_signal [1,N] f32 + length int64 → [1,T,1025] log-probs), rebuilt for
XLA's compile-once model: audio lengths are padded to a fixed bucket ladder
so every forward reuses one of a handful of compiled programs, and batched
entry points serve TTA (one [K, N] dispatch replaces the reference's
2-thread ONNX pool) and corpus eval.

Also provides OracleRuntime — a synthetic acoustic backend that renders CTC
log-probs from ground-truth token sequences under a controllable corruption
model. It stands in for trained weights (the reference snapshot's model
blobs are Git-LFS stubs; SURVEY.md §2.2 asset note) so the entire decision
stack (decode → retrieve → rerank → TTA) is testable end to end.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tilawa_tpu.data.assets import BLANK_ID
from tilawa_tpu.models.fastconformer import FastConformerConfig, FastConformerCTC

# Audio-sample bucket ladder: 4s to 120s at 16 kHz, power-of-two steps.
# Coarse on purpose: each bucket is one ~100s remote compile of the full
# encoder, and compiled programs don't persist across processes on the
# tunneled backend — fewer buckets keeps warmup practical.
AUDIO_BUCKETS = (64000, 128000, 256000, 512000, 1024000, 1920000)


def bucket_length(n: int, buckets: tuple[int, ...] = AUDIO_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(np.ceil(n / buckets[-1])) * buckets[-1]


class EncoderRuntime:
    """Jitted FastConformer forward with audio-length bucketing."""

    def __init__(
        self,
        config: FastConformerConfig | None = None,
        variables=None,
        seed: int = 0,
    ):
        self.config = config or FastConformerConfig.large()
        self.model = FastConformerCTC(self.config)
        if variables is None:
            # jit the init: unjitted flax init dispatches eagerly op-by-op,
            # which over the tunneled-TPU backend means one network
            # round-trip per op.
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 32000), jnp.float32),
                jnp.array([32000], jnp.int32),
            )
        # Checkpoint loads hand back host numpy arrays; pin them on the
        # device ONCE. Otherwise every jitted call re-uploads the full
        # weight set, which on the tunneled backend is a multi-second
        # network transfer per forward.
        self.variables = jax.device_put(variables)
        self._apply = jax.jit(
            functools.partial(
                self.model.apply, deterministic=True, use_running_average=True
            )
        )

        def apply_decode(variables, audio, lengths):
            lp, enc_lens = self.model.apply(
                variables, audio, lengths,
                deterministic=True, use_running_average=True,
            )
            # Pad frames to the rerank bucket inside the same program and
            # reduce the argmax on device: the host then fetches only the
            # tiny id matrix while the log-probs stay device-resident for
            # the CTC rerank — on a tunneled backend every host<->device
            # copy is a network round trip, and [T, 1025] f32 is the only
            # big tensor in the loop.
            from tilawa_tpu.ops.ctc import FRAME_BUCKETS, _next_bucket

            t = lp.shape[1]
            t_pad = _next_bucket(t, FRAME_BUCKETS)
            if t_pad != t:
                lp = jnp.pad(lp, ((0, 0), (0, t_pad - t), (0, 0)))
            ids = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            return lp, enc_lens, ids

        self._apply_decode = jax.jit(apply_decode)

    @property
    def blank_id(self) -> int:
        return self.config.blank_id

    def log_probs(self, audio: np.ndarray) -> tuple[np.ndarray, int]:
        """[N] waveform → ([T, V] log-probs, valid frame count)."""
        lp, lens = self.log_probs_batch([audio])
        return lp[0], int(lens[0])

    def log_probs_batch(
        self, audios: list[np.ndarray]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Variable-length batch → ([B, T_pad, V] log-probs, [B] frame counts).
        All inputs are padded to one shared audio bucket (one XLA program)."""
        n_max = max(len(a) for a in audios)
        n_pad = bucket_length(n_max)
        batch = np.zeros((len(audios), n_pad), dtype=np.float32)
        lengths = np.zeros(len(audios), dtype=np.int32)
        for i, a in enumerate(audios):
            batch[i, : len(a)] = a
            lengths[i] = len(a)
        lp, enc_lens = self._apply(
            self.variables, jnp.asarray(batch), jnp.asarray(lengths)
        )
        return np.asarray(lp), np.asarray(enc_lens)

    def forward(self, audio: np.ndarray):
        """[N] waveform → (lp_device [T_bucket, V] jax.Array still on the
        device, ids [T_enc] np.int32, t_valid int). Only ids/lengths cross
        the host boundary; feed lp_device straight to the rerank."""
        lp, lens, ids = self.forward_batch([audio])
        t_valid = int(lens[0])
        return lp[0], ids[0, :t_valid], t_valid

    def forward_batch(self, audios: list[np.ndarray]):
        """Batched forward: (lp_device [B, T_bucket, V], enc_lens np [B],
        ids np [B, T_enc])... returned as (lp, lens, ids)."""
        n_max = max(len(a) for a in audios)
        n_pad = bucket_length(n_max)
        batch = np.zeros((len(audios), n_pad), dtype=np.float32)
        lengths = np.zeros(len(audios), dtype=np.int32)
        for i, a in enumerate(audios):
            batch[i, : len(a)] = a
            lengths[i] = len(a)
        lp, enc_lens, ids = self._apply_decode(
            self.variables, jnp.asarray(batch), jnp.asarray(lengths)
        )
        return lp, np.asarray(enc_lens), np.asarray(ids)

    def warmup(self, bucket_samples: tuple[int, ...] = (64000, 128000, 256000)):
        for n in bucket_samples:
            self.forward(np.zeros(n, dtype=np.float32))


class OracleRuntime:
    """Synthetic acoustic backend: ground-truth token ids → CTC log-probs.

    Emission model per frame: the scheduled symbol gets probability mass
    (1 - noise), the rest is spread over a random alternative and blank.
    `error_rate` replaces a fraction of emitted tokens with lexical
    neighbors, simulating ASR substitutions; `frames_per_token` paces the
    emission like ~12.5 fps FastConformer output.
    """

    def __init__(
        self,
        token_lookup,
        blank_id: int = BLANK_ID,
        vocab_size: int = BLANK_ID + 1,
        frames_per_token: int = 3,
        noise: float = 0.15,
        error_rate: float = 0.0,
        seed: int = 0,
    ):
        self._lookup = token_lookup  # (surah, ayah, ayah_end) -> list[int]
        self.blank_id = blank_id
        self.vocab_size = vocab_size
        self.frames_per_token = frames_per_token
        self.noise = noise
        self.error_rate = error_rate
        self._rng = np.random.default_rng(seed)

    def render(self, refs: list[tuple[int, int, int | None]]) -> tuple[np.ndarray, int]:
        """Render log-probs for a recitation of the given verse refs."""
        ids: list[int] = []
        for surah, ayah, ayah_end in refs:
            ids.extend(self._lookup(surah, ayah, ayah_end))
        return self.render_ids(ids)

    def render_ids(self, ids: list[int]) -> tuple[np.ndarray, int]:
        """Render log-probs for an explicit token-id sequence (used by the
        tracker oracle, eval/tracker_oracle.py, where window-cropped ids
        come from forced alignments rather than verse refs)."""
        if self.error_rate > 0:
            ids = [
                int(self._rng.integers(0, self.vocab_size - 1))
                if self._rng.random() < self.error_rate else i
                for i in ids
            ]
        t = max(len(ids) * self.frames_per_token + 8, 16)
        lp = np.full((t, self.vocab_size), -20.0, dtype=np.float32)
        frame = 0
        for tok in ids:
            # blank lead-in then the token
            for _ in range(self.frames_per_token - 1):
                lp[frame, self.blank_id] = 0.0
                frame += 1
            lp[frame, tok] = 0.0
            frame += 1
        while frame < t:
            lp[frame, self.blank_id] = 0.0
            frame += 1
        if self.noise > 0:
            jitter = self._rng.normal(0.0, self.noise, size=lp.shape).astype(np.float32)
            lp = lp + jitter
        # renormalize to proper log-probs
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        return lp.astype(np.float32), t
