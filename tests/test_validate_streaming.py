"""Tracker streaming validation harness on a mocked backend.

Mirrors the reference's model-free harness pattern (reference:
web/frontend/test/validate-streaming.ts drives real tracker source;
tracker-deferred.test.ts:1-17 mocks the transcribe backend) — here the
harness functions (replay, emission extraction, scoring aggregation) run
against scripted TranscribeResults and a synthetic WAV corpus.
"""

import json
import wave

import numpy as np
import pytest

from tilawa_tpu.data.quran import QuranDB
from tilawa_tpu.data.token_store import TokenStore
from tilawa_tpu.eval.validate_streaming import (
    emissions_from_messages,
    final_sequence_from_messages,
    replay_sample,
    run_validation,
)
from tilawa_tpu.streaming.tracker import RecitationTracker, TranscribeResult

SR = 16000


@pytest.fixture(scope="module")
def db():
    return QuranDB()


@pytest.fixture(scope="module")
def token_store():
    return TokenStore.load_default()


def scripted_backend(texts):
    state = {"i": 0}

    def transcribe(audio):
        i = min(state["i"], len(texts) - 1)
        state["i"] += 1
        t = texts[i]
        return TranscribeResult(text=t, token_ids=list(range(len(t.split()) * 2)))

    return transcribe


def test_emissions_span_expansion_and_dedup():
    messages = [
        {"type": "raw_transcript", "text": "x"},
        {"type": "verse_match", "surah": 1, "ayah": 1},
        {"type": "verse_match", "surah": 1, "ayah": 2, "ayah_end": 3},
        {"type": "verse_match", "surah": 1, "ayah": 2},  # duplicate
    ]
    got = emissions_from_messages(messages)
    assert got == [
        {"surah": 1, "ayah": 1},
        {"surah": 1, "ayah": 2},
        {"surah": 1, "ayah": 3},
    ]


def test_final_sequence_extraction():
    messages = [
        {"type": "final_sequence", "verses": [{"surah": 1, "ayah": 1}]},
        {"type": "final_sequence", "verses": [{"surah": 1, "ayah": 2}]},
    ]
    # per-utterance final sequences concatenate across the clip (a
    # mid-clip silence flush must not erase earlier utterances' verses)
    assert final_sequence_from_messages(messages) == [
        {"surah": 1, "ayah": 1}, {"surah": 1, "ayah": 2}
    ]
    assert final_sequence_from_messages([{"type": "verse_match"}]) is None


def test_replay_emits_on_scripted_fatiha(db, token_store):
    verse = db.get_verse(1, 1)
    tracker = RecitationTracker(
        scripted_backend([verse["text_clean"]]),
        db=db, token_store=token_store,
    )
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(SR * 3) * 0.1).astype(np.float32)
    messages = replay_sample(tracker, audio, chunk_seconds=0.3)
    emissions = emissions_from_messages(messages)
    assert {"surah": 1, "ayah": 1} in emissions


def _write_wav(path, audio):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2")
        w.writeframes(pcm.tobytes())


def test_run_validation_scores_synthetic_corpus(tmp_path, db, token_store, monkeypatch):
    rng = np.random.default_rng(1)
    _write_wav(tmp_path / "a.wav", rng.standard_normal(SR * 3) * 0.1)
    manifest = {
        "samples": [
            {"id": "syn_1", "file": "a.wav", "surah": 1, "ayah": 1,
             "category": "short"},
        ]
    }
    (tmp_path / "manifest.json").write_text(json.dumps(manifest))

    import tilawa_tpu.eval.runner as runner_mod
    monkeypatch.setitem(runner_mod.CORPUS_DIRS, "synthetic", tmp_path)

    verse = db.get_verse(1, 1)
    result = run_validation(
        scripted_backend([verse["text_clean"]]),
        corpus="synthetic", db=db, token_store=token_store, verbose=False,
    )
    assert result["total"] == 1
    assert result["recall"] == 1.0
    assert result["sequence_accuracy"] == 1.0
    assert result["per_sample"][0]["id"] == "syn_1"
    assert result["audio_sec_per_sec"] > 0
