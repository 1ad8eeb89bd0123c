"""VerseTracker behavior (modeled on the reference test strategy:
tests/test_verse_tracker.py — real QuranDB + synthetic text)."""

import pytest

from tilawa_tpu.streaming.verse_tracker import VerseTracker


@pytest.fixture
def tracker(quran_db):
    return VerseTracker(quran_db)


def test_single_verse_finalize(tracker):
    tracker.process_text("قل هو الله احد")
    out = tracker.finalize()
    assert [(e["surah"], e["ayah"]) for e in out] == [(112, 1)]


def test_consecutive_verses_emit_in_order(quran_db):
    tracker = VerseTracker(quran_db)
    emissions = []
    # feed surah 112 verse by verse as accumulated deltas
    for text in ["قل هو الله احد", "الله الصمد", "لم يلد ولم يولد"]:
        emissions.extend(tracker.process_delta(text))
    emissions.extend(tracker.finalize())
    refs = [(e["surah"], e["ayah"]) for e in emissions]
    assert refs[:2] == [(112, 1), (112, 2)]
    assert (112, 3) in refs


def test_continuation_bias_prefers_next_verse(quran_db):
    # 55:13 refrain appears 31 times; continuation bias must pick the one
    # following the last emission
    tracker = VerseTracker(quran_db, last_emission=(55, 12))
    tracker.process_text("فباي الاء ربكما تكذبان")
    out = tracker.finalize()
    assert [(e["surah"], e["ayah"]) for e in out] == [(55, 13)]


def test_empty_input(tracker):
    assert tracker.process_text("") == []
    assert tracker.process_text("   ") == []
    assert tracker.finalize() == []


def test_no_match_below_threshold(tracker):
    assert tracker.process_text("hello world xyz") == []
    assert tracker.finalize() == []


def test_no_duplicate_emission(quran_db):
    tracker = VerseTracker(quran_db)
    tracker.process_text("قل هو الله احد")
    first = tracker.finalize()
    assert len(first) == 1
    tracker.process_text("قل هو الله احد")
    second = tracker.finalize()
    assert second == []  # same ref suppressed


def test_streaming_mode_min_words(quran_db):
    tracker = VerseTracker(quran_db, streaming_mode=True)
    assert tracker.process_text("قل") == []


def test_overflow_split_emits_multiple(quran_db):
    tracker = VerseTracker(quran_db)
    text = "قل اعوذ برب الناس ملك الناس اله الناس"
    emissions = tracker.process_text(text)
    emissions.extend(tracker.finalize())
    refs = [(e["surah"], e["ayah"]) for e in emissions]
    assert refs == [(114, 1), (114, 2), (114, 3)]
