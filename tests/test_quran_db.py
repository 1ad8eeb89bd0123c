"""QuranDB behavior tests (modeled on the reference test strategy:
tests/test_quran_db.py — verse navigation incl. surah-boundary wrap,
plus retrieval/matching semantics)."""

import pytest


def test_total_verses(quran_db):
    assert quran_db.total_verses == 6236
    assert quran_db.surah_count == 114


def test_get_verse(quran_db):
    v = quran_db.get_verse(1, 1)
    assert v is not None
    assert v["surah"] == 1 and v["ayah"] == 1
    assert quran_db.get_verse(1, 8) is None
    assert quran_db.get_verse(115, 1) is None


def test_get_surah(quran_db):
    assert len(quran_db.get_surah(1)) == 7
    assert len(quran_db.get_surah(2)) == 286
    assert len(quran_db.get_surah(112)) == 4
    assert quran_db.get_surah(999) == []


def test_get_next_verse_within_surah(quran_db):
    nv = quran_db.get_next_verse(1, 1)
    assert (nv["surah"], nv["ayah"]) == (1, 2)


def test_get_next_verse_wraps_surah_boundary(quran_db):
    nv = quran_db.get_next_verse(1, 7)
    assert (nv["surah"], nv["ayah"]) == (2, 1)


def test_get_next_verse_at_end_of_quran(quran_db):
    assert quran_db.get_next_verse(114, 6) is None


def test_bismillah_stripping(quran_db):
    # 1:1 IS the bismillah — no stripped variant
    assert quran_db.get_verse(1, 1)["text_clean_no_bsm"] is None
    # 9:1 has no bismillah
    assert quran_db.get_verse(9, 1)["text_clean_no_bsm"] is None
    # 2:1 starts with bismillah in this corpus -> stripped variant exists
    v = quran_db.get_verse(2, 1)
    if v["text_clean"].startswith("بسم الله"):
        assert v["text_clean_no_bsm"]


def test_match_verse_exact(quran_db):
    m = quran_db.match_verse("قل هو الله احد")
    assert (m["surah"], m["ayah"]) == (112, 1)
    assert m["score"] == pytest.approx(1.0)


def test_match_verse_trigram_path_agrees_with_full(quran_db):
    q = "الحمد لله رب العالمين"
    full = quran_db.match_verse(q)
    fast = quran_db.match_verse(q, use_trigram_index=True)
    assert (full["surah"], full["ayah"]) == (fast["surah"], fast["ayah"])


def test_match_verse_span(quran_db):
    q = "الحمد لله رب العالمين الرحمن الرحيم"
    m = quran_db.match_verse(q, max_span=3)
    assert m["surah"] == 1 and m["ayah"] == 2 and m.get("ayah_end") == 3


def test_match_verse_threshold(quran_db):
    assert quran_db.match_verse("xyzzy qwerty") is None
    assert quran_db.match_verse("") is None


def test_continuation_hint_bonus(quran_db):
    # 93:3 should win over ambiguity when hinted from 93:2
    m = quran_db.match_verse(
        "ما ودعك ربك وما قلى", hint=(93, 2), use_trigram_index=True
    )
    assert (m["surah"], m["ayah"]) == (93, 3)
    assert m["bonus"] > 0


def test_continuation_bonus_wraps_to_next_surah(quran_db):
    bonuses = quran_db._continuation_bonuses((1, 7))
    assert bonuses.get((2, 1)) == pytest.approx(0.22)
    assert bonuses.get((2, 2)) == pytest.approx(0.12)
    assert bonuses.get((2, 3)) == pytest.approx(0.06)


def test_runners_up(quran_db):
    m = quran_db.match_verse(
        "قل هو الله احد", return_top_k=10, use_trigram_index=True
    )
    assert len(m["runners_up"]) == 10
    assert m["runners_up"][0]["surah"] == 112


def test_search_top_k(quran_db):
    res = quran_db.search("قل هو الله احد", top_k=5)
    assert len(res) == 5
    assert (res[0]["surah"], res[0]["ayah"]) == (112, 1)
    assert res[0]["score"] >= res[1]["score"]


def test_spaceless_scan(quran_db):
    # 112:2 — spaceless BPE-style output still retrieves the verse
    res = quran_db.spaceless_scan("اللهالصمد", top_k=5)
    assert (res[0]["surah"], res[0]["ayah"]) == (112, 2)


def test_span_text(quran_db):
    t = quran_db.span_text(112, 1, 2)
    assert "قل هو الله احد" in t
    assert quran_db.span_text(112, 4, 6) is None  # 112 has only 4 ayahs


def test_trigram_candidates(quran_db):
    idxs = quran_db.trigram_candidates("قل هو الله احد", top_k=50)
    assert 0 < len(idxs) <= 50
    refs = {(quran_db.verses[i]["surah"], quran_db.verses[i]["ayah"]) for i in idxs}
    assert (112, 1) in refs


def test_match_verse_span_reachable_via_trigram_rare_word(quran_db):
    # "والعصر ان الانسن" = all of short 103:1 + the head of 103:2. The edit
    # ratio under-ranks 103:1 (query runs past it) but the trigram index
    # ranks it first; the span pass must enumerate surah 103 from that
    # signal and return the 103:1-2 span (round-2 fix, opt-in via
    # seeded_spans so the default path stays reference-parity).
    m = quran_db.match_verse("والعصر ان الانسن", max_span=4, seeded_spans=True)
    assert m and (m["surah"], m["ayah"], m.get("ayah_end")) == (103, 1, 2)
