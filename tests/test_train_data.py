"""Training-data pipeline: bucketing, weighting, hard-example filter.

Reference parity: the NeMo manifests + Lightning dataloader role
(scripts/train_fastconformer_phoneme_modal.py prepare_data) rebuilt as
length-bucketed fixed-shape batches (SURVEY.md §7 Phase 2).
"""

import numpy as np
import pytest

from tilawa_tpu.train.data import (

    BUCKETS,
    bucketed_corpus_batches,
    load_corpus_examples,
    pad_batch,
)

pytestmark = pytest.mark.slow


def test_pad_batch_shapes_and_lengths():
    ex = [
        (np.ones(100, np.float32), [1, 2, 3]),
        (np.ones(50, np.float32), [7]),
    ]
    audio, alens, toks, tlens = pad_batch(ex, 120, 8)
    assert audio.shape == (2, 120) and toks.shape == (2, 8)
    assert list(alens) == [100, 50] and list(tlens) == [3, 1]
    assert audio[1, 50:].sum() == 0 and toks[1, 1:].sum() == 0


def test_bucket_ladder_is_monotonic():
    secs = [b for b, _bs in BUCKETS]
    assert secs == sorted(secs)
    assert secs[-1] >= 160  # covers the longest corpus clip (157 s)


@pytest.fixture(scope="module")
def v1_examples():
    ex = load_corpus_examples("v1", max_audio_s=BUCKETS[-1][0])
    if not ex:
        pytest.skip("corpus audio not available")
    return ex


def test_load_corpus_examples_only_ids(v1_examples):
    all_n = len(load_corpus_examples("v1", max_audio_s=64.0))
    some = load_corpus_examples(
        "v1", max_audio_s=64.0, only_ids={"retasy_000", "retasy_001"}
    )
    assert 0 < len(some) <= 2 < all_n


def test_bucketed_batches_fixed_shapes(v1_examples):
    it = bucketed_corpus_batches(corpora=("v1",), seed=1, augment=False)
    seen = set()
    for _ in range(10):
        audio, alens, toks, tlens = next(it)
        seen.add(audio.shape)
        assert (alens > 0).all() and (tlens > 0).all()
        assert (alens <= audio.shape[1]).all()
        # batch dim matches the bucket's configured size
        sec = audio.shape[1] / 16000
        bs = dict((b, n) for b, n in BUCKETS)[sec]
        assert audio.shape[0] == bs
    assert len(seen) >= 2  # multiple buckets sampled


def test_bucketed_batches_weighting_changes_distribution(v1_examples):
    import collections

    def bucket_counts(weighting):
        it = bucketed_corpus_batches(
            corpora=("v1",), seed=0, augment=False, weighting=weighting
        )
        c = collections.Counter(next(it)[0].shape[1] for _ in range(40))
        return c

    prop = bucket_counts("prop")
    uniform = bucket_counts("uniform")
    # uniform sampling must hit the longest live bucket more often than
    # proportional (v1 has few long clips)
    longest = max(uniform)
    assert uniform.get(longest, 0) >= prop.get(longest, 0)


def test_augment_respects_pad(v1_examples):
    it = bucketed_corpus_batches(corpora=("v1",), seed=2, augment=True)
    for _ in range(6):
        audio, alens, _t, _tl = next(it)
        assert (alens <= audio.shape[1]).all()
        assert np.abs(audio).max() <= 1.0


class TestRandomWindowCrop:
    def _mk(self):
        sr = 16000
        audio = np.arange(8 * sr, dtype=np.float32) / (8 * sr)
        ids = [10, 20, 30, 40]
        spans = np.array(
            [[0, 1 * sr], [2 * sr, 3 * sr], [4 * sr, 5 * sr], [6 * sr, 7 * sr]]
        )
        return audio, ids, spans

    def test_tokens_match_window(self):
        from tilawa_tpu.train.data import random_window_crop

        audio, ids, spans = self._mk()
        rng = np.random.default_rng(0)
        for _ in range(50):
            a2, kept = random_window_crop(
                audio, ids, spans, rng, silence_prob=0.0
            )
            assert set(kept) <= set(ids)
            assert len(a2) <= len(audio)
            # kept tokens are a CONTIGUOUS run in corpus order
            if kept:
                i = ids.index(kept[0])
                assert ids[i : i + len(kept)] == kept

    def test_cuts_snap_to_token_gaps(self):
        # no crop may slice through a token span: every kept window's
        # audio must fully contain every kept token's span
        from tilawa_tpu.train.data import random_window_crop

        audio, ids, spans = self._mk()
        rng = np.random.default_rng(3)
        for _ in range(100):
            a2, kept = random_window_crop(
                audio, ids, spans, rng, silence_prob=0.0
            )
            if not kept:
                continue
            i0 = ids.index(kept[0])
            i1 = i0 + len(kept)
            # window length covers the kept spans entirely
            assert len(a2) >= spans[i1 - 1][1] - spans[i0][0]

    def test_full_window_keeps_all(self):
        from tilawa_tpu.train.data import random_window_crop

        audio, ids, spans = self._mk()

        class FixedRng:
            def integers(self, lo, hi):
                return lo       # interior start at first token

            def random(self):
                return 0.0      # prefix mode, no silence branches

            def uniform(self, a, b):
                return a

            def choice(self, valid):
                return valid[-1]  # furthest cut → full window

        a2, kept = random_window_crop(
            audio, ids, spans, FixedRng(), silence_prob=0.0
        )
        assert kept == ids and len(a2) == len(audio)

    def test_max_len_respected(self):
        from tilawa_tpu.train.data import random_window_crop

        audio, ids, spans = self._mk()
        rng = np.random.default_rng(1)
        for _ in range(20):
            a2, _kept = random_window_crop(
                audio, ids, spans, rng, max_len=4 * 16000
            )
            assert len(a2) <= 4 * 16000

    def test_crop_prob_batches_run(self, tmp_path, monkeypatch):
        # crop_prob path with no alignment assets degrades to full-length
        from tilawa_tpu.train import data as D

        monkeypatch.setattr(
            "tilawa_tpu.train.align.load_alignments", lambda c: {}
        )
        it = D.bucketed_corpus_batches(
            corpora=("v1",), seed=0, crop_prob=0.5
        )
        audio, audio_lens, tokens, token_lens = next(it)
        assert audio.ndim == 2 and (token_lens > 0).all()
