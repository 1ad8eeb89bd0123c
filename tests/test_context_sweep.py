"""Context-sweep diagnostic: metric algebra + batched sweep on a fake runtime."""

import numpy as np

from tilawa_tpu.eval.context_sweep import (
    lcp_len,
    run_sweep,
    sweep_sample,
    token_edits,
)


class TestMetricAlgebra:
    def test_token_edits(self):
        assert token_edits([1, 2, 3], [1, 2, 3]) == 0
        assert token_edits([1, 2, 3], [1, 3]) == 1
        assert token_edits([1, 2, 3], []) == 3
        assert token_edits([], [5, 6]) == 2
        assert token_edits([1, 2, 3], [4, 5, 6]) == 3

    def test_lcp(self):
        assert lcp_len([1, 2, 3], [1, 2, 4]) == 2
        assert lcp_len([], [1]) == 0
        assert lcp_len([7], [7]) == 1


class FakeRuntime:
    """Emits one token per second of audio: second k → token (k+1)."""

    blank_id = 0

    def log_probs_batch(self, pieces):
        t_valids = []
        max_t = 0
        rows = []
        for p in pieces:
            secs = max(1, len(p) // 16000)
            ids = []
            for k in range(secs):
                ids.extend([k + 1, 0])  # token then blank
            rows.append(ids)
            t_valids.append(len(ids))
            max_t = max(max_t, len(ids))
        lp = np.full((len(pieces), max_t, 10), -30.0, np.float32)
        for i, ids in enumerate(rows):
            lp[i, np.arange(len(ids)), ids] = 0.0
        return lp, np.asarray(t_valids)


class TestSweep:
    def test_prefixes_are_stable_prefixes(self):
        rt = FakeRuntime()
        audio = np.zeros(6 * 16000, np.float32)
        decodes = sweep_sample(rt, audio, contexts=(1.0, 3.0, 5.0))
        assert decodes["1"] == [1]
        assert decodes["3"] == [1, 2, 3]
        assert decodes["full"] == [1, 2, 3, 4, 5, 6]
        # every prefix decode is an exact prefix of the full decode
        for k in ("1", "3", "5"):
            d = decodes[k]
            assert d == decodes["full"][: len(d)]

    def test_run_sweep_structure(self, monkeypatch, tmp_path):
        # two fake manifest samples with wav files on disk
        import tilawa_tpu.eval.context_sweep as cs

        sr = 16000
        monkeypatch.setattr(
            cs, "load_manifest",
            lambda corpus: (
                [{"id": "a", "file": "a.npy", "surah": 1, "ayah": 1}],
                tmp_path,
            ),
        )
        np.save(tmp_path / "a.npy", np.zeros(4 * sr, np.float32))
        monkeypatch.setattr(
            cs, "load_audio", lambda p: np.load(str(p) + ("" if str(p).endswith(".npy") else ""))
        )

        class Store:
            def ids_for_key(self, s, a):
                return [1, 2, 3, 4]

        monkeypatch.setattr(
            cs.TokenStore, "load_default", staticmethod(lambda: Store())
        )
        out = run_sweep(FakeRuntime(), corpus="x", verbose=False)
        assert out["wer_vs_reference"]["full"]["value"] == 0.0
        assert out["wer_vs_reference"]["2"]["value"] == 0.5  # 2 of 4 tokens seen
        assert out["instability_vs_full"]["2"]["value"] == 0.0
