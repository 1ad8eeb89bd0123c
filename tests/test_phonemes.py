"""Phoneme alignment, correction mapping, and the PhonemeStore.

Mirrors the reference's alignment semantics (shared/phoneme_aligner.py) and
correction grouping (web/frontend/src/lib/correction.ts) on synthetic
sequences, plus store lookups over the real quran_phonemes.json asset.
"""

import numpy as np
import pytest

from tilawa_tpu.data.phonemes import PhonemeStore
from tilawa_tpu.text.phonemes import (
    align_phoneme_strings,
    align_phonemes,
    word_corrections,
)


class TestAlignPhonemes:
    def test_perfect_match(self):
        r = align_phonemes(["b", "i", "s", "m"], ["b", "i", "s", "m"])
        assert r.errors == []
        assert r.per == 0.0
        assert r.correct_rate == 1.0
        assert r.alignment == [("b", "b"), ("i", "i"), ("s", "s"), ("m", "m")]

    def test_substitution(self):
        r = align_phonemes(["b", "u", "s"], ["b", "i", "s"])
        assert len(r.errors) == 1
        e = r.errors[0]
        assert (e.type, e.position, e.expected, e.got) == ("substitution", 1, "i", "u")
        assert r.per == pytest.approx(1 / 3)
        assert r.correct_rate == pytest.approx(2 / 3)

    def test_deletion(self):
        r = align_phonemes(["b", "s"], ["b", "i", "s"])
        assert [e.type for e in r.errors] == ["deletion"]
        assert r.errors[0].expected == "i"
        assert r.per == pytest.approx(1 / 3)

    def test_insertion(self):
        r = align_phonemes(["b", "i", "x", "s"], ["b", "i", "s"])
        assert [e.type for e in r.errors] == ["insertion"]
        assert r.errors[0].got == "x"
        assert r.correct_rate == 1.0  # all 3 reference tokens matched

    def test_both_empty(self):
        r = align_phonemes([], [])
        assert r.per == 0.0 and r.correct_rate == 1.0 and r.alignment == []

    def test_empty_reference_all_insertions(self):
        r = align_phonemes(["a", "b"], [])
        assert [e.type for e in r.errors] == ["insertion", "insertion"]
        assert r.per == 2.0 and r.correct_rate == 0.0

    def test_empty_predicted_all_deletions(self):
        r = align_phonemes([], ["a", "b"])
        assert [e.type for e in r.errors] == ["deletion", "deletion"]
        assert r.per == 1.0 and r.correct_rate == 0.0

    def test_string_wrapper(self):
        r = align_phoneme_strings("b i s m", "b i s m")
        assert r.per == 0.0

    def test_geminated_tokens_distinct(self):
        # "ll" vs "l" is a substitution, not a match.
        r = align_phonemes(["a", "l", "a"], ["a", "ll", "a"])
        assert [e.type for e in r.errors] == ["substitution"]


class TestWordCorrections:
    def test_no_errors(self):
        assert word_corrections("b i | s m", "b i | s m") == []

    def test_error_mapped_to_second_word(self):
        out = word_corrections("b i | s u m", "b i | s a m")
        assert len(out) == 1
        c = out[0]
        assert c["word_index"] == 1
        assert c["expected"] == "a" and c["got"] == "u"
        assert c["error_type"] == "substitution"

    def test_max_word_index_filters(self):
        out = word_corrections("b i | s u m", "b i | s a m", max_word_index=1)
        assert out == []

    def test_empty_inputs(self):
        assert word_corrections("", "b i") == []
        assert word_corrections("b i", "") == []

    def test_multiple_errors_same_word_grouped(self):
        out = word_corrections("b a | t a m", "b i | s u m")
        idxs = sorted(c["word_index"] for c in out)
        assert idxs == [0, 1]


class TestPhonemeStore:
    @pytest.fixture(scope="class")
    def store(self):
        return PhonemeStore.load_default()

    def test_vocab_shape(self, store):
        assert store.blank_id == 69
        assert store.num_classes == 70
        assert store.vocab[68] == "|"

    def test_reference_lookup(self, store):
        ref = store.reference_phonemes(1, 1)
        assert ref.startswith("b i s m i")
        assert len(store.refs) == 6236

    def test_span_join(self, store):
        joined = store.reference_phonemes(112, 1, 2)
        assert store.reference_phonemes(112, 1) in joined
        assert store.reference_phonemes(112, 2) in joined

    def test_decode_ids_collapse_and_blank(self, store):
        b = store.blank_id
        # "b" id and "i" id
        bi = store.vocab.index("b")
        ii = store.vocab.index("i")
        assert store.decode_ids([bi, bi, b, ii, ii, b, b]) == "b i"

    def test_decode_logprobs(self, store):
        b, bi = store.blank_id, store.vocab.index("b")
        lp = np.full((4, store.num_classes), -10.0, dtype=np.float32)
        lp[0, bi] = 0.0
        lp[1, b] = 0.0
        lp[2, bi] = 0.0
        lp[3, b] = 0.0
        assert store.decode_logprobs(lp) == "b b"
        assert store.decode_logprobs(lp, t_valid=2) == "b"

    def test_detect_mispronunciations_clean(self, store):
        ref = store.reference_phonemes(1, 1)
        out = store.detect_mispronunciations(ref, 1, 1)
        assert out["per"] == 0.0
        assert out["corrections"] == []

    def test_detect_mispronunciations_with_error(self, store):
        ref = store.reference_phonemes(1, 1)
        toks = ref.split()
        # corrupt the first non-boundary phoneme
        toks[0] = "t" if toks[0] != "t" else "s"
        out = store.detect_mispronunciations(" ".join(toks), 1, 1)
        assert out["per"] > 0.0
        assert out["corrections"] and out["corrections"][0]["word_index"] == 0

    def test_detect_unknown_verse(self, store):
        out = store.detect_mispronunciations("b i", 1, 999)
        assert "error" in out and out["errors"] == []


class TestPhonemePipeline:
    def test_oracle_roundtrip(self):
        from tilawa_tpu.pipeline.phoneme import PhonemeOracleRuntime

        rt = PhonemeOracleRuntime(noise=0.0)
        lp, t = rt.render(1, 1)
        decoded = rt.store.decode_logprobs(lp, t)
        ref = rt.store.reference_phonemes(1, 1)
        assert decoded == ref

    def test_oracle_mispronunciation_report(self):
        from tilawa_tpu.pipeline.phoneme import PhonemeOracleRuntime

        rt = PhonemeOracleRuntime(noise=0.0, error_rate=0.15, seed=3)
        lp, t = rt.render(2, 255)  # ayat al-kursi, long verse
        predicted = rt.store.decode_logprobs(lp, t)
        out = rt.store.detect_mispronunciations(predicted, 2, 255)
        assert out["per"] > 0.0
        assert out["errors"]

    def test_phoneme_model_config(self):
        from tilawa_tpu.models.fastconformer import FastConformerConfig

        cfg = FastConformerConfig.phoneme()
        assert cfg.blank_id == 69
        assert cfg.num_classes == 70


def test_ngram_vote_localizes_fatiha():
    from tilawa_tpu.data.phonemes import PhonemeStore

    store = PhonemeStore.load_default()
    # feed verses 2-4 of Al-Fatiha verbatim: the rarity vote must put
    # surah 1 first with a contiguous run covering them
    text = " ".join(
        store.refs[(1, a)] for a in range(2, 5)
    )
    votes = store.ngram_vote(text)
    assert votes, "no votes returned"
    top = votes[0]
    assert top["surah"] == 1
    assert top["ayah"] <= 2 and top["ayah_end"] >= 4


def test_ngram_vote_empty_and_short():
    from tilawa_tpu.data.phonemes import PhonemeStore

    store = PhonemeStore.load_default()
    assert store.ngram_vote("") == []
    assert store.ngram_vote("a b") == []
