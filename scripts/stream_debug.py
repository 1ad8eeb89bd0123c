#!/usr/bin/env python
"""Replay ONE corpus sample through the REAL-model streaming tracker with
the diagnostic event stream printed — the real-acoustics twin of
scripts/oracle_debug.py.

Usage:
  TILAWA_CHECKPOINT=exports/stream6-int8 \
      python scripts/stream_debug.py v3 ea_alafasy_009060
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tilawa_tpu.data.audio import load_audio
from tilawa_tpu.data.quran import QuranDB
from tilawa_tpu.data.token_store import TokenStore
from tilawa_tpu.eval.runner import load_manifest
from tilawa_tpu.eval.validate_streaming import (
    emissions_from_messages,
    replay_sample,
)
from tilawa_tpu.pipeline.predict import Recognizer
from tilawa_tpu.pipeline.runtime import EncoderRuntime
from tilawa_tpu.streaming.tracker import RecitationTracker
from tilawa_tpu.train.checkpoint import load_variables, shipped_checkpoint


def main() -> int:
    corpus, sid = sys.argv[1], sys.argv[2]
    samples, corpus_dir = load_manifest(corpus)
    sample = next(s for s in samples if s["id"] == sid)
    audio = load_audio(corpus_dir / sample["file"])

    config, variables = load_variables(shipped_checkpoint())
    rec = Recognizer(EncoderRuntime(config, variables))

    def transcribe(window: np.ndarray):
        return rec.transcribe_result(window)

    def diag(event: dict) -> None:
        kind = event.get("type", "?")
        keep = {k: v for k, v in event.items()
                if k != "type" and not isinstance(v, (bytes, np.ndarray))}

        def fmt(v):
            if isinstance(v, float):
                return round(v, 3)
            if isinstance(v, list) and v and isinstance(v[0], dict):
                return [{kk: fmt(vv) for kk, vv in d.items()} for d in v[:5]]
            return v

        print(f"    [{kind}] " + " ".join(
            f"{k}={fmt(v)}" for k, v in keep.items()))

    tracker = RecitationTracker(
        transcribe, db=QuranDB(), token_store=TokenStore.load_default(),
        on_diagnostic=diag,
    )
    t0 = time.perf_counter()
    messages = replay_sample(tracker, audio, 0.3)
    for m in messages:
        if m.get("type") in ("verse_match", "verse_rollback"):
            print("MSG", {k: m[k] for k in ("type", "surah", "ayah", "ayah_end", "confidence") if k in m})
    emissions = emissions_from_messages(messages)
    print("expected:", sample.get("expected_verses")
          or [{"surah": sample["surah"], "ayah": sample["ayah"]}])
    print("emitted :", [(e["surah"], e["ayah"]) for e in emissions])
    print(f"wall={time.perf_counter() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
