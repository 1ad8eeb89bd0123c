"""TokenTrie + trie-constrained CTC beam search.

Mirrors the reference's trie-beam test approach (reference:
web/frontend/test/trie-beam.test.ts: real trie from quran_phonemes.json +
synthetic log-prob tensors).
"""

import numpy as np
import pytest

from tilawa_tpu.data.phonemes import PhonemeStore
from tilawa_tpu.ops.beam import beam_search_decode
from tilawa_tpu.pipeline.phoneme import PhonemeOracleRuntime
from tilawa_tpu.text.trie import TokenTrie, build_verse_trie

pytestmark = pytest.mark.slow



class TestTokenTrie:
    def test_tiny_trie(self):
        trie = TokenTrie.build([
            ([1, 2, 3], ("a",)),
            ([1, 2, 4], ("b",)),
            ([5], ("c",)),
        ])
        assert trie.num_nodes == 6  # root + 1,2,3,4,5
        toks, kids = trie.children(0)
        assert toks.tolist() == [1, 5]
        n = trie.walk([1, 2, 3])
        assert n is not None and trie.refs_at(n) == [("a",)]
        assert trie.walk([1, 9]) is None
        assert trie.is_terminal(trie.walk([5]))
        assert not trie.is_terminal(trie.walk([1, 2]))

    def test_shared_prefix_terminal(self):
        trie = TokenTrie.build([([1], "x"), ([1, 2], "y")])
        assert trie.refs_at(trie.walk([1])) == ["x"]
        assert trie.refs_at(trie.walk([1, 2])) == ["y"]

    def test_full_verse_trie(self):
        store = PhonemeStore.load_default()
        trie = build_verse_trie(store)
        assert trie.num_nodes > 100_000
        # every verse's phoneme sequence must terminate at a node carrying
        # its own ref
        tok_to_id = {t: i for i, t in enumerate(store.vocab)}
        for surah, ayah in [(1, 1), (2, 255), (112, 1), (114, 6)]:
            ids = [tok_to_id[t] for t in store.refs[(surah, ayah)].split()]
            node = trie.walk(ids)
            assert node is not None
            assert (surah, ayah, None) in trie.refs_at(node)


class TestBeamSearch:
    @pytest.fixture(scope="class")
    def setup(self):
        store = PhonemeStore.load_default()
        trie = build_verse_trie(store)
        rt = PhonemeOracleRuntime(store=store, noise=0.0)
        return store, trie, rt

    def test_clean_oracle_decodes_right_verse(self, setup):
        store, trie, rt = setup
        lp, t = rt.render(112, 1)
        results = beam_search_decode(lp, store.blank_id, trie, beam_width=8)
        assert results
        best = results[0]
        assert (112, 1, None) in best.matched_refs
        assert best.is_complete

    def test_noisy_oracle_still_matches(self, setup):
        store, trie, _ = setup
        rt = PhonemeOracleRuntime(store=store, noise=1.0, seed=7)
        lp, t = rt.render(1, 1)
        results = beam_search_decode(lp, store.blank_id, trie, beam_width=8)
        assert any((1, 1, None) in r.matched_refs for r in results[:3])

    def test_beam_width_respected(self, setup):
        store, trie, rt = setup
        lp, t = rt.render(103, 1)
        results = beam_search_decode(lp, store.blank_id, trie, beam_width=4)
        assert len(results) <= 4

    def test_scores_sorted(self, setup):
        store, trie, rt = setup
        lp, t = rt.render(108, 1)
        results = beam_search_decode(lp, store.blank_id, trie)
        scores = [r.score for r in results]
        assert scores == sorted(scores, reverse=True)

    def test_empty_frames(self, setup):
        store, trie, _ = setup
        lp = np.zeros((0, store.num_classes), dtype=np.float32)
        results = beam_search_decode(lp, store.blank_id, trie)
        assert len(results) == 1 and results[0].token_ids == ()
