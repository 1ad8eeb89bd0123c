"""n-gram LM training, scoring, and shallow-fusion rescoring."""

import math

import pytest

from tilawa_tpu.data.quran import QuranDB
from tilawa_tpu.text.ngram import NGramLM, lm_rescore, load_unigrams


@pytest.fixture(scope="module")
def lm():
    return NGramLM.from_corpus_file(order=5)


class TestNGramLM:
    def test_trains_over_full_corpus(self, lm):
        assert lm.total_words > 70_000
        assert len(lm.vocab) > 10_000

    def test_real_verse_beats_shuffled(self, lm):
        db = QuranDB()
        words = db.get_verse(1, 2)["text_clean"].split()
        shuffled = list(reversed(words))
        assert lm.sentence_logp(words) > lm.sentence_logp(shuffled)

    def test_seen_bigram_beats_oov(self, lm):
        db = QuranDB()
        w = db.get_verse(1, 2)["text_clean"].split()
        assert lm.logp(w[1], (w[0],)) > lm.logp("كلمةغيرموجودة", (w[0],))

    def test_backoff_monotone(self, lm):
        # an OOV word's score is finite (floor), not -inf
        assert math.isfinite(lm.logp("كلمةغيرموجودة"))

    def test_perplexity_sane(self, lm):
        db = QuranDB()
        words = db.get_verse(2, 255)["text_clean"].split()
        ppl = lm.perplexity(words)
        assert 1.0 < ppl < 1000.0

    def test_unigrams_asset(self):
        uni = load_unigrams()
        assert len(uni) > 10_000


class TestLMRescore:
    def test_fusion_prefers_real_text(self, lm):
        db = QuranDB()
        real = db.get_verse(1, 2)["text_clean"]
        fake = " ".join(reversed(real.split()))
        hyps = [
            {"text": fake, "score": 0.1},
            {"text": real, "score": 0.0},
        ]
        out = lm_rescore(hyps, lm, alpha=0.7, beta=1.0)
        assert out[0]["text"] == real
        assert out[0]["fused_score"] >= out[1]["fused_score"]

    def test_acoustic_dominates_with_zero_alpha(self, lm):
        hyps = [{"text": "a", "score": 1.0}, {"text": "b", "score": 5.0}]
        out = lm_rescore(hyps, lm, alpha=0.0, beta=0.0)
        assert out[0]["text"] == "b"

    def test_empty_hypotheses(self, lm):
        assert lm_rescore([], lm) == []
