"""CTC scorer numerics: batched JAX lattice vs a float64 NumPy oracle and
optax.ctc_loss (the torch-F.ctc_loss-equivalent loss used in training)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tilawa_tpu.ops.ctc import (  # noqa: E402

    collapse_ctc,
    ctc_forward_scores,
    ctc_forward_scores_batch,
    pad_candidates,
    pad_frames,
)

pytestmark = pytest.mark.slow

BLANK = 8
VOCAB = 9


def numpy_ctc_score(log_probs: np.ndarray, ids: list[int], blank: int) -> float:
    """Float64 two-row alpha recursion — direct port of the reference
    semantics (lib/ctc-rescore.ts:35-102) used as the numerics oracle."""
    t_steps = log_probs.shape[0]
    l = len(ids)
    if l == 0 or 2 * l + 1 > t_steps:
        return float("inf")
    s = 2 * l + 1
    states = [blank if i % 2 == 0 else ids[(i - 1) // 2] for i in range(s)]
    prev = np.full(s, -np.inf)
    prev[0] = log_probs[0, blank]
    if s > 1:
        prev[1] = log_probs[0, states[1]]
    for t in range(1, t_steps):
        curr = np.full(s, -np.inf)
        for si in range(s):
            total = prev[si]
            if si > 0:
                total = np.logaddexp(total, prev[si - 1])
            if si > 1 and states[si] != blank and states[si] != states[si - 2]:
                total = np.logaddexp(total, prev[si - 2])
            if total != -np.inf:
                curr[si] = total + log_probs[t, states[si]]
        prev = curr
    final = prev[s - 1]
    if s > 1:
        final = np.logaddexp(final, prev[s - 2])
    if not np.isfinite(final):
        return float("inf")
    return -final / l


def random_logprobs(t, v=VOCAB, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(t, v)).astype(np.float32)
    x = x - np.log(np.exp(x).sum(-1, keepdims=True))
    return x


def test_matches_numpy_oracle():
    lp = random_logprobs(24)
    cands = [[1, 2, 3], [4, 4, 5], [7], [1, 2, 2, 3, 5, 6, 7, 1, 2, 3, 4, 5]]
    tokens, lengths = pad_candidates(cands, token_buckets=(16,), cand_buckets=(8,))
    out = np.asarray(
        ctc_forward_scores(jnp.array(lp), jnp.int32(24), jnp.array(tokens),
                           jnp.array(lengths), BLANK)
    )
    for i, ids in enumerate(cands):
        expect = numpy_ctc_score(lp, ids, BLANK)
        if np.isinf(expect):
            assert np.isinf(out[i])
        else:
            assert out[i] == pytest.approx(expect, rel=1e-4), f"cand {i}"
    # padded rows are infeasible (length 0)
    assert np.isinf(out[len(cands):]).all()


def test_infeasible_when_too_many_tokens():
    lp = random_logprobs(9)
    cands = [[1, 2, 3, 4, 5]]  # 2*5+1 = 11 > 9
    tokens, lengths = pad_candidates(cands, token_buckets=(8,), cand_buckets=(8,))
    out = np.asarray(
        ctc_forward_scores(jnp.array(lp), jnp.int32(9), jnp.array(tokens),
                           jnp.array(lengths), BLANK)
    )
    assert np.isinf(out[0])


def test_t_valid_masking():
    """Scoring with padded frames + t_valid must equal scoring the unpadded
    matrix — the determinism/fidelity contract for bucketed batching."""
    lp = random_logprobs(20, seed=3)
    padded, t = pad_frames(lp, frame_buckets=(32,))
    cands = [[1, 2, 3], [6, 5]]
    tokens, lengths = pad_candidates(cands, token_buckets=(8,), cand_buckets=(8,))
    a = np.asarray(ctc_forward_scores(jnp.array(lp), jnp.int32(20),
                                      jnp.array(tokens), jnp.array(lengths), BLANK))
    b = np.asarray(ctc_forward_scores(jnp.array(padded), jnp.int32(t),
                                      jnp.array(tokens), jnp.array(lengths), BLANK))
    np.testing.assert_allclose(a[:2], b[:2], rtol=1e-5)


def test_matches_optax_ctc_loss():
    optax = pytest.importorskip("optax")
    lp = random_logprobs(30, seed=7)
    ids = [1, 3, 2, 5]
    tokens, lengths = pad_candidates([ids], token_buckets=(8,), cand_buckets=(8,))
    ours = np.asarray(
        ctc_forward_scores(jnp.array(lp), jnp.int32(30), jnp.array(tokens),
                           jnp.array(lengths), BLANK)
    )[0]
    # optax.ctc_loss(logits [B,T,V], logitpaddings, labels [B,L], labelpaddings)
    logits = jnp.array(lp)[None]
    labels = jnp.array([ids], dtype=jnp.int32)
    loss = optax.ctc_loss(
        logits,
        jnp.zeros((1, 30)),
        labels,
        jnp.zeros((1, len(ids))),
        blank_id=BLANK,
    )[0]
    # optax uses log_epsilon=-1e5 clamping internally — slightly looser match
    assert ours == pytest.approx(float(loss) / len(ids), rel=2e-3)


def test_batch_variant():
    lp0 = random_logprobs(24, seed=1)
    lp1 = random_logprobs(24, seed=2)
    cands = [[1, 2], [3, 4, 5]]
    tokens, lengths = pad_candidates(cands, token_buckets=(8,), cand_buckets=(8,))
    batch = np.asarray(
        ctc_forward_scores_batch(
            jnp.array(np.stack([lp0, lp1])), jnp.array([24, 20], dtype=jnp.int32),
            jnp.array(tokens), jnp.array(lengths), BLANK,
        )
    )
    single0 = np.asarray(ctc_forward_scores(jnp.array(lp0), jnp.int32(24),
                                            jnp.array(tokens), jnp.array(lengths), BLANK))
    single1 = np.asarray(ctc_forward_scores(jnp.array(lp1), jnp.int32(20),
                                            jnp.array(tokens), jnp.array(lengths), BLANK))
    np.testing.assert_allclose(batch[0][:2], single0[:2], rtol=1e-5)
    np.testing.assert_allclose(batch[1][:2], single1[:2], rtol=1e-5)


def test_collapse_ctc():
    assert collapse_ctc([1, 1, BLANK, 2, 2, 2, BLANK, BLANK, 1], BLANK) == [1, 2, 1]
    assert collapse_ctc([], BLANK) == []
    assert collapse_ctc([BLANK, BLANK], BLANK) == []
    assert collapse_ctc([5], BLANK) == [5]


def test_pad_candidates_bucketing():
    from tilawa_tpu.ops.ctc import CAND_BUCKETS, TOKEN_BUCKETS, _next_bucket

    tokens, lengths = pad_candidates([[1] * 40, [2] * 10])
    assert tokens.shape == (
        _next_bucket(2, CAND_BUCKETS), _next_bucket(40, TOKEN_BUCKETS)
    )
    assert lengths[0] == 40 and lengths[1] == 10 and lengths[2:].sum() == 0


class TestStablePrefix:
    def _render(self, ids, v=30, blank=29, fpt=3):
        import numpy as np
        t = len(ids) * fpt + 6
        lp = np.full((t, v), -15.0, dtype=np.float32)
        f = 0
        for tok in ids:
            for _ in range(fpt - 1):
                lp[f, blank] = 0.0; f += 1
            lp[f, tok] = 0.0; f += 1
        while f < t:
            lp[f, blank] = 0.0; f += 1
        return lp - np.log(np.exp(lp).sum(-1, keepdims=True)), t

    def test_prefers_longest_supported_prefix(self):
        from tilawa_tpu.pipeline.rerank import choose_longest_stable_prefix

        seq = [1, 2, 3, 4, 5]
        lp, t = self._render(seq)
        prefixes = [seq[:k] for k in (1, 2, 3, 4, 5)]
        best = choose_longest_stable_prefix(lp, t, prefixes, blank_id=29)
        assert best == 4  # the full sequence

    def test_unsupported_suffix_not_chosen(self):
        from tilawa_tpu.pipeline.rerank import choose_longest_stable_prefix

        lp, t = self._render([1, 2, 3])
        prefixes = [[1, 2], [1, 2, 3], [1, 2, 3, 7, 8, 9]]
        best = choose_longest_stable_prefix(lp, t, prefixes, blank_id=29)
        assert best == 1

    def test_empty(self):
        from tilawa_tpu.pipeline.rerank import choose_longest_stable_prefix
        import numpy as np

        assert choose_longest_stable_prefix(
            np.zeros((4, 30), np.float32), 4, [], blank_id=29
        ) is None
