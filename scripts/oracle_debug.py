#!/usr/bin/env python
"""Replay ONE corpus sample through the tracker oracle with the
diagnostic event stream printed — the single-sample policy-failure
microscope (reference analogue: diagnose-sample.ts / tracker debug
messages, web/frontend/src/worker/inference.ts:31-39).

Usage:
  JAX_PLATFORMS=cpu python scripts/oracle_debug.py v3 ea_husary_multi_109_001_006
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
from tilawa_tpu.data.tokenizer import SentencePieceBPE
from tilawa_tpu.eval.runner import load_manifest
from tilawa_tpu.eval.tracker_oracle import make_factory
from tilawa_tpu.eval.validate_streaming import (
    emissions_from_messages,
    final_sequence_from_messages,
    replay_sample,
)
from tilawa_tpu.streaming.tracker import RecitationTracker


def main() -> int:
    corpus, sid = sys.argv[1], sys.argv[2]
    noise = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    samples, corpus_dir = load_manifest(corpus)
    sample = next(s for s in samples if s["id"] == sid)
    audio = load_audio(corpus_dir / sample["file"])

    tokenizer = SentencePieceBPE.load_default()
    factory = make_factory(corpus, tokenizer, noise=noise)
    transcriber = factory(sample, audio)
    if transcriber is None:
        print("sample skipped (no/degenerate alignment)")
        return 1

    db = QuranDB()
    token_store = TokenStore.load_default()

    def diag(event: dict) -> None:
        kind = event.get("type", "?")
        keep = {
            k: v
            for k, v in event.items()
            if k != "type" and not isinstance(v, (bytes, np.ndarray))
        }
        # Compact floats for readability
        def fmt(v):
            if isinstance(v, float):
                return round(v, 3)
            if isinstance(v, list) and v and isinstance(v[0], dict):
                return [
                    {kk: fmt(vv) for kk, vv in d.items()} for d in v[:6]
                ]
            return v

        print(f"    [{kind}] " + " ".join(
            f"{k}={fmt(v)}" for k, v in keep.items()
        ))

    tracker = RecitationTracker(
        transcriber, db=db, token_store=token_store, on_diagnostic=diag
    )
    t0 = time.perf_counter()
    messages = replay_sample(
        tracker, audio, 0.3, on_chunk=transcriber.on_chunk
    )
    for m in messages:
        if m.get("type") in (
            "verse_match", "verse_rollback", "final_sequence"
        ):
            print("MSG", m)
    emissions = emissions_from_messages(messages)
    print("expected:", sample.get("expected_verses"))
    print("emitted :", [(e["surah"], e["ayah"]) for e in emissions])
    fs = final_sequence_from_messages(messages)
    print("viterbi :", [(e["surah"], e["ayah"]) for e in fs] if fs else None)
    print(f"wall={time.perf_counter() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
