"""RecitationSession FSM tests with scripted transcribe backends (the
reference's mocked-backend pattern, e.g. test/tracker-deferred.test.ts)."""

import numpy as np
import pytest

from tilawa_tpu.streaming.session import (
    RecitationSession,
    align_position,
    strip_leading_residual,
)

SR = 16000


def loud(seconds: float) -> np.ndarray:
    rng = np.random.default_rng(0)
    return (0.1 * rng.standard_normal(int(seconds * SR))).astype(np.float32)


def silence(seconds: float) -> np.ndarray:
    return np.zeros(int(seconds * SR), dtype=np.float32)


class ScriptedBackend:
    """Returns scripted transcripts in order, then repeats the last."""

    def __init__(self, texts: list[str]):
        self.texts = list(texts)
        self.calls = 0

    def __call__(self, audio: np.ndarray) -> str:
        i = min(self.calls, len(self.texts) - 1)
        self.calls += 1
        return self.texts[i]


def collect(session, chunks):
    out = []
    for c in chunks:
        out.extend(session.feed(c))
    return out


def test_align_position_greedy_forward():
    verse = "قل هو الله احد".split()
    pos, matched = align_position("قل هو".split(), verse)
    assert pos == 2 and matched == [0, 1]
    # resumes from prior position
    pos2, matched2 = align_position("الله احد".split(), verse, start_from=2)
    assert pos2 == 4 and matched2 == [2, 3]


def test_align_position_lookahead_skips_deletions():
    verse = "a b c d e f g".split()
    pos, matched = align_position(["a", "d"], verse)
    assert matched == [0, 3]


def test_strip_leading_residual():
    prev = "قل هو الله احد"
    text = "قل هو الله احد الله الصمد"
    stripped, score = strip_leading_residual(text, prev)
    assert stripped == "الله الصمد"
    assert score > 0.9


def test_discovery_commits_strong_first_match(quran_db):
    backend = ScriptedBackend(["قل هو الله احد"])
    s = RecitationSession(backend, db=quran_db)
    out = collect(s, [loud(1.0), loud(1.0), loud(0.5)])
    types = [m["type"] for m in out]
    assert "verse_match" in types
    vm = next(m for m in out if m["type"] == "verse_match")
    assert (vm["surah"], vm["ayah"]) == (112, 1)
    assert s.in_tracking


def test_silence_does_not_trigger_discovery(quran_db):
    backend = ScriptedBackend(["قل هو الله احد"])
    s = RecitationSession(backend, db=quran_db)
    out = collect(s, [silence(2.5)])
    assert out == []
    assert backend.calls == 0


def test_weak_match_sends_raw_transcript(quran_db):
    # Gibberish-ish text that still matches something weakly (< 0.75 first bar)
    backend = ScriptedBackend(["الله الله الله الله نور"])
    s = RecitationSession(backend, db=quran_db)
    out = collect(s, [loud(2.5)])
    assert all(m["type"] == "raw_transcript" for m in out)
    assert not s.in_tracking


def test_tracking_word_progress_and_complete(quran_db):
    # First discovery commits 112:1; then tracking aligns word by word.
    # 112:2 — a verse whose text_clean has no bismillah prefix, so one
    # full-coverage tracking cycle completes it.
    backend = ScriptedBackend(
        [
            "الله الصمد",      # discovery -> verse_match + tracking
            "الله الصمد",      # tracking cycle: full coverage -> complete
        ]
    )
    s = RecitationSession(backend, db=quran_db)
    out = collect(s, [loud(2.5)])
    assert [m["type"] for m in out] == ["verse_match"]
    assert (out[0]["surah"], out[0]["ayah"]) == (112, 2)
    out2 = collect(s, [loud(0.6)])
    assert [m["type"] for m in out2] == ["word_progress"]
    assert out2[0]["word_index"] == 2 and out2[0]["total_words"] == 2
    # coverage >= 0.8 & near end -> verse complete -> back to discovery
    assert not s.in_tracking
    assert s.last_emitted_ref == (112, 2)


def test_tracking_stale_exit_with_rollback(quran_db):
    backend = ScriptedBackend(
        ["الله الصمد"] + ["كلمات غير متطابقه ابدا"] * 10
    )
    s = RecitationSession(backend, db=quran_db)
    collect(s, [loud(2.5)])
    assert s.in_tracking
    # 4 stale cycles with no progress -> exit + rollback (progress 0 < 50%)
    for _ in range(5):
        collect(s, [loud(0.6)])
    assert not s.in_tracking
    assert s.last_emitted_ref is None  # rolled back to pre-tracking state


def test_continuation_commit_after_first(quran_db):
    backend = ScriptedBackend(
        [
            "الله الصمد",            # -> verse_match 112:2, tracking
            "الله الصمد",            # tracking completes immediately
            "لم يلد ولم يولد",     # discovery: expected followup 112:3
        ]
    )
    s = RecitationSession(backend, db=quran_db)
    collect(s, [loud(2.5)])      # discovery + enter tracking
    collect(s, [loud(0.6)])      # tracking -> complete
    assert not s.in_tracking
    out = collect(s, [loud(2.5)])
    vm = [m for m in out if m["type"] == "verse_match"]
    assert vm and (vm[0]["surah"], vm[0]["ayah"]) == (112, 3)


class TestTokenRoundTrip:
    def test_precomputed_ids_round_trip(self):
        """Asset integrity: precomputed verse token ids decode back to the
        verse text (reference: quran-text-adapter.ts:54-75)."""
        from tilawa_tpu.data.quran import QuranDB
        from tilawa_tpu.data.token_store import TokenStore

        store = TokenStore.load_default()
        db = QuranDB()
        problems = store.validate_round_trip(db, sample_every=300)
        assert problems == []
