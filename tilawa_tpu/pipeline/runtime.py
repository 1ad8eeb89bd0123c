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

import os
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

# Long-clip chunking (forward path): clips past LONG_THRESHOLD run as ONE
# batched [K, LONG_CHUNK] dispatch of overlapping windows whose log-probs
# are stitched in-graph (half the overlap trimmed from each side of every
# junction). Kills the 512000+ single-clip buckets — the 1024000 bucket
# alone cost 75 s of warm-up compile per bench process (BENCH_r02) — and
# keeps self-attention quadratic in 16 s, not 64 s. The reference applies
# the same policy at 25 s/1 s for its O(T^2) path
# (reference: EXPERIMENTS.md:245 w2v-phonemes chunking; SURVEY.md §5.7).
LONG_CHUNK = 256000        # 16 s
LONG_OVERLAP = 16000       # 1 s
LONG_STEP = LONG_CHUNK - LONG_OVERLAP
LONG_THRESHOLD = LONG_CHUNK
# enc frames to trim per junction side: ~12.5 overlap frames / 2
_JUNCTION_TRIM = 6


def bucket_length(n: int, buckets: tuple[int, ...] = AUDIO_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(np.ceil(n / buckets[-1])) * buckets[-1]


class EncoderRuntime:
    """Jitted FastConformer forward with audio-length bucketing.

    long_chunking=True routes clips past LONG_THRESHOLD through the
    chunked stitched forward (forward_long). Default OFF for the batch
    predict path: a model trained only on full utterances decodes partial
    windows as garbage (measured on the champion: chunk0 of a 23 s clip
    decodes to noise while the full clip is perfect — the same
    memorization pathology behind the streaming campaign,
    EXPERIMENTS.md context-sweep). Crop-trained checkpoints handle
    chunks; the streaming path (StreamingEncoderCache) always chunks
    because its windows are partial either way."""

    def __init__(
        self,
        config: FastConformerConfig | None = None,
        variables=None,
        seed: int = 0,
        long_chunking: bool = False,
    ):
        self.long_chunking = long_chunking
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
        def apply_fp(variables, audio, lengths):
            if jnp.issubdtype(audio.dtype, jnp.integer):
                audio = audio.astype(jnp.float32) / 32768.0
            return self.model.apply(
                variables, audio, lengths,
                deterministic=True, use_running_average=True,
            )

        self._apply = jax.jit(apply_fp)

        def apply_decode(variables, audio, lengths):
            # int16 inputs (TILAWA_INT16_UPLOAD) are PCM samples — halve
            # the host->device audio bytes over the tunnel and rescale
            # in-graph (the source files are 16-bit PCM, so the cast is
            # information-preserving).
            if jnp.issubdtype(audio.dtype, jnp.integer):
                audio = audio.astype(jnp.float32) / 32768.0
            lp, enc_lens = self.model.apply(
                variables, audio, lengths,
                deterministic=True, use_running_average=True,
            )
            # Pad frames to the rerank bucket inside the same program and
            # reduce the argmax on device: the host then fetches only the
            # tiny id matrix while the log-probs stay device-resident for
            # the CTC rerank — on a tunneled backend every host<->device
            # copy is a network round trip, and [T, 1025] f32 is the only
            # big tensor in the loop. enc_lens rides as column 0 of the id
            # matrix: ONE fetched buffer instead of two round trips.
            from tilawa_tpu.ops.ctc import FRAME_BUCKETS, _next_bucket

            t = lp.shape[1]
            t_pad = _next_bucket(t, FRAME_BUCKETS)
            if t_pad != t:
                lp = jnp.pad(lp, ((0, 0), (0, t_pad - t), (0, 0)))
            ids = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            packed = jnp.concatenate(
                [enc_lens.astype(jnp.int32)[:, None], ids], axis=1
            )
            return lp, packed

        self._apply_decode = jax.jit(apply_decode)
        self._int16_upload = os.getenv(
            "TILAWA_INT16_UPLOAD", "1"
        ) not in ("", "0", "false")
        self._long_programs: dict[int, object] = {}

    def _long_program(self, k: int):
        """Jitted K-chunk stitched forward (one program per chunk count)."""
        fn = self._long_programs.get(k)
        if fn is not None:
            return fn
        from tilawa_tpu.ops.ctc import FRAME_BUCKETS, _next_bucket

        trim = _JUNCTION_TRIM

        def apply_long(variables, audio, last_len):
            # audio [K, LONG_CHUNK]; last_len: true samples in final chunk
            if jnp.issubdtype(audio.dtype, jnp.integer):
                audio = audio.astype(jnp.float32) / 32768.0
            lengths = jnp.full((k,), LONG_CHUNK, jnp.int32).at[k - 1].set(
                last_len
            )
            lp, enc_lens = self.model.apply(
                variables, audio, lengths,
                deterministic=True, use_running_average=True,
            )
            tc = lp.shape[1]
            parts = [lp[0, : tc - trim]]
            for i in range(1, k - 1):
                parts.append(lp[i, trim : tc - trim])
            parts.append(lp[k - 1, trim:])
            out = jnp.concatenate(parts, axis=0)
            t_total = out.shape[0]
            t_pad = _next_bucket(t_total, FRAME_BUCKETS)
            if t_pad != t_total:
                out = jnp.pad(out, ((0, t_pad - t_total), (0, 0)))
            t_valid = (
                (tc - trim)
                + (k - 2) * (tc - 2 * trim)
                + jnp.maximum(enc_lens[k - 1] - trim, 0)
            )
            ids = jnp.argmax(out, axis=-1).astype(jnp.int32)
            return out, jnp.minimum(t_valid, t_total), ids

        fn = jax.jit(apply_long)
        self._long_programs[k] = fn
        return fn

    @staticmethod
    def chunk_count(n_samples: int) -> int:
        """Number of LONG_CHUNK windows covering n_samples (>= 2 when the
        clip exceeds LONG_THRESHOLD)."""
        if n_samples <= LONG_THRESHOLD:
            return 1
        k = 1
        while (k - 1) * LONG_STEP + LONG_CHUNK < n_samples:
            k += 1
        return k

    def forward_long(self, audio: np.ndarray):
        """Chunked forward for clips > LONG_THRESHOLD: one [K, LONG_CHUNK]
        dispatch, junction-trimmed stitch on device. Same contract as
        forward(): (lp_device [T_pad, V], ids np [t_valid], t_valid)."""
        n = len(audio)
        k = self.chunk_count(n)
        dt = np.int16 if self._int16_upload else np.float32
        batch = np.zeros((k, LONG_CHUNK), dtype=dt)
        last_len = 0
        for i in range(k):
            start = i * LONG_STEP
            piece = audio[start : start + LONG_CHUNK]
            if dt == np.int16:
                batch[i, : len(piece)] = np.clip(
                    piece * 32768.0, -32768, 32767
                ).astype(np.int16)
            else:
                batch[i, : len(piece)] = piece
            last_len = len(piece)
        lp, t_valid, ids = self._long_program(k)(
            self.variables, jnp.asarray(batch), jnp.int32(last_len)
        )
        t_valid = int(t_valid)
        return lp, np.asarray(ids)[:t_valid], t_valid

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
        the host boundary; feed lp_device straight to the rerank. With
        long_chunking, clips past LONG_THRESHOLD route through the
        chunked stitched forward."""
        if self.long_chunking and len(audio) > LONG_THRESHOLD:
            return self.forward_long(audio)
        lp, lens, ids = self.forward_batch([audio])
        t_valid = int(lens[0])
        return lp[0], ids[0, :t_valid], t_valid

    def forward_batch_async(self, audios: list[np.ndarray]):
        """Dispatch a batched forward WITHOUT synchronizing: returns
        (lp_device, packed_device). XLA dispatch is asynchronous, so a
        caller can queue every bucket's forward back-to-back and only then
        fetch results — on the tunneled backend that hides the per-dispatch
        network round trip behind device compute (the difference between
        sum(RTT_i + compute_i) and RTT + sum(compute_i))."""
        n_max = max(len(a) for a in audios)
        n_pad = bucket_length(n_max)
        dt = np.int16 if self._int16_upload else np.float32
        batch = np.zeros((len(audios), n_pad), dtype=dt)
        lengths = np.zeros(len(audios), dtype=np.int32)
        for i, a in enumerate(audios):
            if dt == np.int16:
                batch[i, : len(a)] = np.clip(
                    a * 32768.0, -32768, 32767
                ).astype(np.int16)
            else:
                batch[i, : len(a)] = a
            lengths[i] = len(a)
        return self._apply_decode(
            self.variables, jnp.asarray(batch), jnp.asarray(lengths)
        )

    def forward_batch(self, audios: list[np.ndarray]):
        """Batched forward: (lp_device [B, T_bucket, V], enc_lens np [B],
        ids np [B, T_enc])... returned as (lp, lens, ids)."""
        lp, packed = self.forward_batch_async(audios)
        packed = np.asarray(packed)
        return lp, packed[:, 0], packed[:, 1:]

    def warmup(self, bucket_samples: tuple[int, ...] = (64000, 128000, 256000)):
        for n in bucket_samples:
            self.forward(np.zeros(n, dtype=np.float32))


class StreamingEncoderCache:
    """Content-addressed per-chunk encoder cache for rolling windows.

    The streaming tracker re-forwards its WHOLE discovery window every
    0.25-2 s; past the 16 s chunk threshold, most of that window is
    byte-identical to the previous cycle (new audio only appends; the head
    only moves on a commit trim). Keying each full LONG_CHUNK chunk by its
    content hash makes every cycle cost: one [1, LONG_CHUNK] forward for
    the growing tail + one stitch dispatch — constant per cycle instead of
    O(window). This is SURVEY §7 Phase 3's \"cache encoder prefixes\"
    headline win; the reference pays the full-window ONNX re-forward every
    cycle (reference: web/frontend/src/lib/tracker.ts:601, 1033).

    Numerics match forward_long exactly: chunks are normalized per-chunk
    in both paths (per-utterance mel stats are per batch row), and the
    stitch applies the same junction trim.
    """

    MAX_ENTRIES = 24

    def __init__(self, runtime: "EncoderRuntime"):
        self.runtime = runtime
        self._cache: dict[bytes, object] = {}   # chunk sha1 -> lp [Tc, V] device
        self._stitch_programs: dict[int, object] = {}
        self.hits = 0
        self.misses = 0

    def _stitch(self, k: int):
        fn = self._stitch_programs.get(k)
        if fn is not None:
            return fn
        import jax

        from tilawa_tpu.ops.ctc import FRAME_BUCKETS, _next_bucket

        trim = _JUNCTION_TRIM

        def stitch(chunks, last_enc_len):
            # chunks: K arrays [Tc, V]; last one padded like the rest
            tc = chunks[0].shape[0]
            parts = [chunks[0][: tc - trim]]
            for i in range(1, k - 1):
                parts.append(chunks[i][trim : tc - trim])
            parts.append(chunks[k - 1][trim:])
            out = jnp.concatenate(parts, axis=0)
            t_total = out.shape[0]
            t_pad = _next_bucket(t_total, FRAME_BUCKETS)
            if t_pad != t_total:
                out = jnp.pad(out, ((0, t_pad - t_total), (0, 0)))
            t_valid = (
                (tc - trim)
                + (k - 2) * (tc - 2 * trim)
                + jnp.maximum(last_enc_len - trim, 0)
            )
            ids = jnp.argmax(out, axis=-1).astype(jnp.int32)
            return out, jnp.minimum(t_valid, t_total), ids

        fn = jax.jit(stitch)
        self._stitch_programs[k] = fn
        return fn

    def forward(self, audio: np.ndarray):
        """Same contract as EncoderRuntime.forward, with chunk caching."""
        rt = self.runtime
        n = len(audio)
        if n <= LONG_THRESHOLD:
            return rt.forward(audio)
        k = rt.chunk_count(n)

        chunk_lps: list[object] = []
        to_run: list[tuple[int, bytes, np.ndarray]] = []
        for i in range(k):
            start = i * LONG_STEP
            piece = audio[start : start + LONG_CHUNK]
            if i < k - 1:
                key = _chunk_key(piece)
                hit = self._cache.get(key)
                if hit is not None:
                    self.hits += 1
                    chunk_lps.append(hit)
                else:
                    self.misses += 1
                    chunk_lps.append(None)
                    to_run.append((i, key, piece))
            else:
                chunk_lps.append(None)
                to_run.append((i, b"", piece))

        # Pad the miss batch to a {1,2,4,8} ladder: steady state is 1 (the
        # growing tail chunk); cold windows/post-trim realignments compile
        # at most 3 more [B, LONG_CHUNK] programs.
        b_pad = 1
        while b_pad < len(to_run):
            b_pad *= 2
        # Mirror the runtime's upload dtype so cached-stitched numerics
        # stay exactly equal to forward_long's (unit-tested contract).
        dt = np.int16 if rt._int16_upload else np.float32
        batch = np.zeros((b_pad, LONG_CHUNK), dtype=dt)
        lengths = np.zeros(b_pad, dtype=np.int32)
        for j, (_i, _key, piece) in enumerate(to_run):
            if dt == np.int16:
                batch[j, : len(piece)] = np.clip(
                    piece * 32768.0, -32768, 32767
                ).astype(np.int16)
            else:
                batch[j, : len(piece)] = piece
            lengths[j] = len(piece)
        lp_new, enc_lens = rt._apply(
            rt.variables, jnp.asarray(batch), jnp.asarray(lengths)
        )
        last_enc_len = None
        for j, (i, key, _piece) in enumerate(to_run):
            chunk_lps[i] = lp_new[j]
            if i < k - 1:
                self._cache[key] = lp_new[j]
            else:
                last_enc_len = enc_lens[j]
        while len(self._cache) > self.MAX_ENTRIES:
            self._cache.pop(next(iter(self._cache)))

        lp, t_valid, ids = self._stitch(k)(chunk_lps, last_enc_len)
        t_valid = int(t_valid)
        return lp, np.asarray(ids)[:t_valid], t_valid


def _chunk_key(piece: np.ndarray) -> bytes:
    import hashlib

    return hashlib.sha1(piece.tobytes()).digest()


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
