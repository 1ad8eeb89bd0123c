"""The champion batch pipeline: audio → (surah, ayah[, ayah_end]).

Recognizer = the reference's c2c-direct algorithm family (reference:
experiments/c2c-direct/run.py predict():394-445, c2c-direct-mixed,
c2c-direct-mixed-tta) on the TPU runtime:

  log-probs (jitted encoder or oracle) → greedy CTC decode + detokenize +
  normalize → three-strategy candidate build → 0.80 text-confidence gate →
  batched on-device CTC rerank (span penalty 0.5) → best.

TTA (reference: c2c-direct-mixed-tta/run.py): anchor 1.0x pass; if score
< 0.5, the 0.9x/1.1x perturbed passes run as ONE batched 2-way encoder
dispatch (replacing the reference's 2-thread ONNX pool), then majority vote
with score-pick fallback.

Stage timings are collected when TILAWA_PROFILE=1 (reference's
C2C_DIRECT_MIXED_PROFILE convention).
"""

from __future__ import annotations

import math
import os
import time
from pathlib import Path

import numpy as np

from tilawa_tpu.data.audio import load_audio, speed_perturb
from tilawa_tpu.data.normalizer import normalize_arabic
from tilawa_tpu.data.quran import QuranDB
from tilawa_tpu.data.token_store import TokenStore
from tilawa_tpu.ops.ctc import collapse_ctc
from tilawa_tpu.pipeline.candidates import build_candidates, text_match
from tilawa_tpu.pipeline.rerank import ctc_rerank

FALLBACK_THRESHOLD = float(os.getenv("TILAWA_THRESHOLD", "0.80"))
TTA_SKIP_THRESHOLD = float(os.getenv("TILAWA_TTA_SKIP", "0.5"))
TTA_FACTORS = (0.9, 1.1)
PROFILE = os.getenv("TILAWA_PROFILE", "") not in ("", "0", "false")
# Window-level streaming TTA (one [2, bucket] dispatch per decode cycle)
STREAM_TTA = os.getenv("TILAWA_STREAM_TTA", "") not in ("", "0", "false")


def _empty(transcript: str = "") -> dict:
    return {
        "surah": 0,
        "ayah": 0,
        "ayah_end": None,
        "score": 0.0,
        "transcript": transcript,
        "candidates": [],
    }


class Recognizer:
    """predict()/transcribe() over any acoustic runtime exposing
    log_probs(audio) -> ([T,V], t_valid) and log_probs_batch(list)."""

    def __init__(
        self,
        runtime,
        db: QuranDB | None = None,
        token_store: TokenStore | None = None,
        tokenizer=None,
        tta: bool = False,
        rerank_mode: str = "gated",
    ):
        """rerank_mode: "gated" (reference champion: CTC rerank only when
        the text match scores < 0.80, c2c-direct/run.py:66), "always"
        (ctc-alignment-style forced alignment of every candidate), or
        "never" (nvidia-fastconformer-style zero-shot text matching)."""
        self.runtime = runtime
        self.db = db or QuranDB()
        self.token_store = token_store or TokenStore.load_default()
        self.tokenizer = tokenizer or self.token_store.tokenizer
        self.tta = tta
        self.rerank_mode = rerank_mode
        self.last_profile: dict[str, float] = {}

    # ------------------------------------------------------------ decoding

    def greedy_decode(self, log_probs: np.ndarray, t_valid: int) -> str:
        ids = np.asarray(log_probs[:t_valid]).argmax(axis=-1)
        deduped = collapse_ctc(ids, self.runtime.blank_id)
        if not deduped:
            return ""
        return normalize_arabic(self.tokenizer.decode(deduped).strip())

    # ------------------------------------------------------------- predict

    def decode_ids(self, ids: np.ndarray) -> str:
        deduped = collapse_ctc(np.asarray(ids), self.runtime.blank_id)
        if not deduped:
            return ""
        return normalize_arabic(self.tokenizer.decode(deduped).strip())

    def _predict_from_logprobs(
        self, log_probs: np.ndarray, t_valid: int, transcript: str | None = None
    ) -> dict:
        t0 = time.perf_counter()
        if transcript is None:
            transcript = self.greedy_decode(log_probs, t_valid)
        t1 = time.perf_counter()
        if not transcript.strip():
            return _empty("")

        base = text_match(self.db, transcript)
        if self.rerank_mode == "always":
            use_ctc = True
        elif self.rerank_mode == "never":
            use_ctc = False
        else:
            use_ctc = (
                base is None
                or float(base.get("score", 0.0)) < FALLBACK_THRESHOLD
            )
        # The expensive retrieval passes only run when the rerank will
        # consume them (identical results; the gate's decision depends on
        # the pass-1 score alone).
        candidates = (
            build_candidates(self.db, transcript, base=base)[0] if use_ctc else []
        )
        t2 = time.perf_counter()
        if not candidates and not base:
            return _empty(transcript)
        ranked = (
            ctc_rerank(log_probs, t_valid, candidates, self.token_store,
                       blank_id=self.runtime.blank_id)
            if use_ctc
            else []
        )
        t3 = time.perf_counter()
        if PROFILE:
            self.last_profile.update(
                decode=t1 - t0, build=t2 - t1, rerank=t3 - t2
            )

        if use_ctc and ranked:
            best = ranked[0]
            source = "ctc"
            score = (
                math.exp(-best["ctc_norm_loss"])
                if math.isfinite(best["ctc_norm_loss"])
                else 0.0
            )
        elif base:
            best, source, score = base, "text", float(base.get("score", 0.0))
        else:
            return _empty(transcript)

        out_candidates = [
            {
                "surah": c["surah"],
                "ayah": c["ayah"],
                "ayah_end": c.get("ayah_end") or c["ayah"],
                "score": round(float(c.get("final_score", c.get("score", 0.0))), 4),
            }
            for c in (ranked[:5] if ranked else [best])
        ]
        return {
            "surah": best["surah"],
            "ayah": best["ayah"],
            "ayah_end": best.get("ayah_end") or best["ayah"],
            "score": round(score, 4),
            "transcript": transcript,
            "source": source,
            "candidates": out_candidates,
        }

    def predict_audio(self, audio: np.ndarray) -> dict:
        t0 = time.perf_counter()
        device_path = hasattr(self.runtime, "forward")
        if device_path:
            # Device-resident: fetch only argmax ids; log-probs stay on the
            # TPU for the rerank (tunnel round trips are the latency floor).
            lp, ids, t_valid = self.runtime.forward(audio)
            transcript = self.decode_ids(ids)
        else:
            lp, t_valid = self.runtime.log_probs(audio)
            transcript = None
        t1 = time.perf_counter()
        if PROFILE:
            self.last_profile = {"forward": t1 - t0}
        result = self._predict_from_logprobs(lp, t_valid, transcript)
        if not self.tta or result["score"] >= TTA_SKIP_THRESHOLD:
            if PROFILE:
                self.last_profile["audio_s"] = len(audio) / 16000.0
            return result

        t_tta = time.perf_counter()
        # Hard sample: batched 2-way perturbed pass (one dispatch).
        perturbed = [speed_perturb(audio, f) for f in TTA_FACTORS]
        from tilawa_tpu.pipeline.runtime import LONG_THRESHOLD

        if device_path and max(len(p) for p in perturbed) > LONG_THRESHOLD:
            # Long clip: sequential per-variant forwards (2 dispatches on
            # already-warm [1, bucket] programs — avoids compiling a rare
            # [2, 512000+] TTA shape).
            preds = []
            for p in perturbed:
                lp_p, ids_p, tv_p = self.runtime.forward(p)
                preds.append(
                    self._predict_from_logprobs(
                        lp_p, tv_p, self.decode_ids(ids_p)
                    )
                )
        elif device_path:
            lps, t_valids, ids_b = self.runtime.forward_batch(perturbed)
            preds = [
                self._predict_from_logprobs(
                    lps[i], int(t_valids[i]),
                    self.decode_ids(ids_b[i, : int(t_valids[i])]),
                )
                for i in range(len(perturbed))
            ]
        else:
            lps, t_valids = self.runtime.log_probs_batch(perturbed)
            preds = [
                self._predict_from_logprobs(lps[i], int(t_valids[i]))
                for i in range(len(perturbed))
            ]
        all_preds = [preds[0], result, preds[1]]  # 0.9x, 1.0x, 1.1x
        if PROFILE:
            self.last_profile["tta"] = time.perf_counter() - t_tta
            self.last_profile["audio_s"] = len(audio) / 16000.0
        return self.tta_vote(all_preds)

    @staticmethod
    def tta_vote(all_preds: list[dict]) -> dict:
        """Majority vote over [0.9x, 1.0x, 1.1x] predictions, highest-score
        fallback (reference: c2c-direct-mixed-tta/run.py:133-148)."""
        keys = [(p["surah"], p["ayah"]) for p in all_preds]
        counts: dict[tuple[int, int], int] = {}
        for k in keys:
            counts[k] = counts.get(k, 0) + 1
        top = max(counts, key=counts.get)
        if counts[top] >= 2:
            for p in all_preds:
                if (p["surah"], p["ayah"]) == top:
                    p["tta"] = "majority"
                    p["tta_preds"] = keys
                    return p
        best = max(all_preds, key=lambda p: p["score"])
        best["tta"] = "score_pick"
        best["tta_preds"] = keys
        best["tta_scores"] = [p["score"] for p in all_preds]
        return best

    def predict(self, audio_path: str | Path) -> dict:
        return self.predict_audio(load_audio(audio_path))

    def model_size(self) -> int:
        """Packed on-device weight bytes (the reference reports its ONNX
        file size, 88,307,366 B — export_metadata.json; runner records it
        per results row, benchmark/runner.py model_size)."""
        try:
            from tilawa_tpu.train.quantize import packed_size_bytes

            return packed_size_bytes(self.runtime.variables)
        except Exception:  # noqa: BLE001 — oracle runtimes have no variables
            return 0

    # ---------------------------------------------------------- transcribe

    LONG_CHUNK_S = 25.0
    LONG_OVERLAP_S = 1.0

    def transcribe_audio(self, audio: np.ndarray) -> str:
        if hasattr(self.runtime, "forward"):
            if (
                not getattr(self.runtime, "long_chunking", False)
                and len(audio) > self.LONG_CHUNK_S * 16000
            ):
                # Without in-graph chunking a very long clip would compile
                # an unbounded ceil-to-ladder bucket with quadratic
                # attention — degrade to the 25 s text-concat chunking
                # instead (code review r3 finding #6).
                return self._transcribe_long(audio)
            # forward() chunk-stitches long clips in-graph, so the decode
            # is over one coherent log-prob sequence (strictly better than
            # the per-chunk text concatenation the non-device path uses).
            _lp, ids, _t = self.runtime.forward(audio)
            return self.decode_ids(ids)
        if len(audio) > self.LONG_CHUNK_S * 16000:
            return self._transcribe_long(audio)
        lp, t_valid = self.runtime.log_probs(audio)
        return self.greedy_decode(lp, t_valid)

    def transcribe_result(self, audio: np.ndarray):
        """Full acoustic decode for the streaming tracker: normalized text
        + collapsed token ids + DEVICE-RESIDENT log-probs (fuels the
        tracker's CTC candidate fusion; reference: worker/inference.ts
        transcribe() → tracker acoustic scoring).

        Device runtimes route through a StreamingEncoderCache: windows past
        16 s re-forward only the growing tail chunk per cycle (content-
        addressed chunk cache + on-device stitch) and only argmax ids cross
        the host boundary — the [T, 1025] log-probs stay on the TPU for
        the fusion scorer, which accepts device arrays."""
        from tilawa_tpu.streaming.tracker import TranscribeResult

        if hasattr(self.runtime, "forward"):
            # Chunk-cached windows only when the runtime opts into
            # chunking: full-window decodes score ~9pp better on stream5
            # (r2 0.409 full vs 0.318 chunked) because crop training never
            # saw stitched junctions; the cache is the scalability path
            # (constant per-cycle cost), full windows the accuracy path.
            if getattr(self.runtime, "long_chunking", False):
                if getattr(self, "_stream_cache", None) is None:
                    from tilawa_tpu.pipeline.runtime import StreamingEncoderCache

                    self._stream_cache = StreamingEncoderCache(self.runtime)
                lp, ids, t_valid = self._stream_cache.forward(audio)
            elif STREAM_TTA and len(audio) >= 16000:
                # Window-level TTA (VERDICT r3 task 1c): partial rolling
                # windows are the streaming model's weak regime — decode
                # the window AND a 0.9x-speed variant in ONE [2, bucket]
                # dispatch and keep the richer decode (more non-blank
                # tokens = the variant that "heard" more; ties prefer the
                # unperturbed window).
                from tilawa_tpu.data.audio import speed_perturb

                lps, lens, ids_b = self.runtime.forward_batch(
                    [audio, speed_perturb(audio, 0.9)]
                )
                t0v, t1v = int(lens[0]), int(lens[1])
                d0 = collapse_ctc(ids_b[0, :t0v], self.runtime.blank_id)
                d1 = collapse_ctc(ids_b[1, :t1v], self.runtime.blank_id)
                if len(d1) > len(d0) + 1:
                    lp, ids, t_valid = lps[1], ids_b[1, :t1v], t1v
                else:
                    lp, ids, t_valid = lps[0], ids_b[0, :t0v], t0v
            else:
                lp, ids, t_valid = self.runtime.forward(audio)
            deduped = collapse_ctc(ids, self.runtime.blank_id)
            text = (
                normalize_arabic(self.tokenizer.decode(deduped).strip())
                if deduped else ""
            )
            return TranscribeResult(
                text=text,
                token_ids=list(deduped),
                log_probs=lp,
                t_valid=int(t_valid),
            )

        lp, t_valid = self.runtime.log_probs(audio)
        ids = np.asarray(lp[:t_valid]).argmax(axis=-1)
        deduped = collapse_ctc(ids, self.runtime.blank_id)
        text = (
            normalize_arabic(self.tokenizer.decode(deduped).strip())
            if deduped else ""
        )
        return TranscribeResult(
            text=text,
            token_ids=list(deduped),
            log_probs=np.asarray(lp),
            t_valid=int(t_valid),
        )

    def _transcribe_long(self, audio: np.ndarray) -> str:
        """Long-audio policy: 25 s windows with 1 s overlap, each decoded
        independently and concatenated (reference: w2v-phonemes long-file
        chunking, EXPERIMENTS.md:245 — the windowing keeps the O(T^2)
        attention cost bounded; SURVEY.md §5.7). Chunks run as ONE batched
        bucket-padded dispatch instead of a Python loop of forwards."""
        sr = 16000
        step = int((self.LONG_CHUNK_S - self.LONG_OVERLAP_S) * sr)
        chunk = int(self.LONG_CHUNK_S * sr)
        pieces = [audio[s:s + chunk] for s in range(0, max(len(audio) - 1, 1), step)]
        pieces = [p for p in pieces if len(p) >= sr // 2] or [audio[:chunk]]
        if hasattr(self.runtime, "forward_batch"):
            _lps, t_valids, ids_b = self.runtime.forward_batch(pieces)
            texts = [
                self.decode_ids(ids_b[i, : int(t_valids[i])])
                for i in range(len(pieces))
            ]
        else:
            lps, t_valids = self.runtime.log_probs_batch(pieces)
            texts = [
                self.greedy_decode(lps[i], int(t_valids[i]))
                for i in range(len(pieces))
            ]
        return " ".join(t for t in texts if t).strip()

    def transcribe(self, audio_path: str | Path) -> str:
        return self.transcribe_audio(load_audio(audio_path))
