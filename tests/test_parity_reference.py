"""Score-exact parity vs the reference implementation (when mounted).

Loads the reference's Python modules with a Levenshtein shim (our native
ratio has identical semantics) and compares outputs 1:1. Skipped when
/root/reference is absent.
"""

import sys
import types
from pathlib import Path

import pytest

REF = Path("/root/reference")

pytestmark = [
    pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted"),
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def ref_modules():
    from tilawa_tpu.text import levenshtein as ourlev

    shim = types.ModuleType("Levenshtein")
    shim.ratio = ourlev.ratio
    shim.distance = ourlev.distance
    sys.modules.setdefault("Levenshtein", shim)
    for name in ("librosa", "soundfile"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.path.insert(0, str(REF))
    try:
        from shared.normalizer import normalize_arabic as ref_norm
        from shared.quran_db import QuranDB as RefDB
        from shared.verse_tracker import VerseTracker as RefVT

        yield ref_norm, RefDB(), RefVT
    finally:
        sys.path.remove(str(REF))


QUERIES = [
    "قل هو الله احد",
    "الحمد لله رب العالمين الرحمن الرحيم",
    "ان الذين كفروا سواء عليهم",
    "والضحى والليل اذا سجى ما ودعك ربك وما قلى",
    "بسم الله الرحمن الرحيم الحمد لله رب العالمين",
]


def test_normalizer_parity_on_sample(ref_modules, quran_db):
    ref_norm, _refdb, _ = ref_modules
    from tilawa_tpu.data.normalizer import normalize_arabic

    for v in quran_db.verses[::37]:  # every 37th verse (~170 cases)
        raw = v["text_uthmani"]
        assert normalize_arabic(raw) == ref_norm(raw)
        assert normalize_arabic(raw, strip_hamza=True) == ref_norm(
            raw, strip_hamza=True
        )


@pytest.mark.parametrize("query", QUERIES)
def test_match_verse_parity(ref_modules, quran_db, query):
    _n, refdb, _ = ref_modules
    for kwargs in (
        {},
        {"use_trigram_index": True},
        {"hint": (93, 1), "max_span": 4},
    ):
        r1 = refdb.match_verse(query, **kwargs)
        r2 = quran_db.match_verse(query, **kwargs)
        k1 = (
            (r1["surah"], r1["ayah"], r1.get("ayah_end"), round(r1["score"], 6))
            if r1 else None
        )
        k2 = (
            (r2["surah"], r2["ayah"], r2.get("ayah_end"), round(r2["score"], 6))
            if r2 else None
        )
        assert k1 == k2, f"{query} {kwargs}"


@pytest.mark.parametrize("query", QUERIES[:3])
def test_search_parity(ref_modules, quran_db, query):
    _n, refdb, _ = ref_modules
    s1 = [(x["surah"], x["ayah"]) for x in refdb.search(query, top_k=5)]
    s2 = [(x["surah"], x["ayah"]) for x in quran_db.search(query, top_k=5)]
    assert s1 == s2


def test_verse_tracker_best_match_parity(ref_modules, quran_db):
    _n, _refdb, RefVT = ref_modules
    from tilawa_tpu.streaming.verse_tracker import VerseTracker

    for text in [
        "قل هو الله احد الله الصمد لم يلد ولم يولد",
        "فباي الاء ربكما تكذبان",
    ]:
        rm = RefVT()._find_best_match(text)
        om = VerseTracker(quran_db)._find_best_match(text)
        assert (rm["surah"], rm["ayah"]) == (om["surah"], om["ayah"])
        assert rm["score"] == pytest.approx(om["score"], abs=1e-9)
