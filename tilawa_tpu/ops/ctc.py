"""CTC primitives: greedy decode + batched forward-algorithm scoring.

This is the TPU-native replacement for both of the reference's CTC scoring
paths:
  * torch F.ctc_loss batched rerank (reference: experiments/c2c-direct/
    run.py:314-380 — batches of 16, log_probs.expand, zero_infinity)
  * the TS log-space alpha recursion (reference: web/frontend/src/lib/
    ctc-rescore.ts:35-102 — two-row Float64 DP per candidate)

Design: ONE lax.scan over time steps carries the alpha lattice for ALL
candidates simultaneously — state [C, S] with S = 2·L_max+1 — so the whole
rerank is a single XLA program: no Python loop over candidates, no batch
chunking. Variable lengths are handled with masks (candidate token length L_c,
log-prob valid length T_valid), and infeasible candidates (2L+1 > T) come
back as +inf, matching torch's zero_infinity semantics at the caller.

Scores are length-normalized NLL: score[c] = -log p(tokens_c | logprobs) / L_c,
identical to both reference formulations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def build_ctc_states(tokens: jnp.ndarray, blank_id: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Interleave blanks: tokens [C, L] -> (states [C, 2L+1], skip_allowed [C, 2L+1]).

    states[c, 2k] = blank, states[c, 2k+1] = tokens[c, k].
    skip_allowed[c, s] marks the s-2 -> s transition (non-blank state whose
    label differs from the label two states back).
    """
    c, l = tokens.shape
    s = 2 * l + 1
    states = jnp.full((c, s), blank_id, dtype=tokens.dtype)
    states = states.at[:, 1::2].set(tokens)
    prev_tok = jnp.concatenate(
        [jnp.full((c, 1), -1, dtype=tokens.dtype), tokens[:, :-1]], axis=1
    )
    skip = jnp.zeros((c, s), dtype=bool)
    skip = skip.at[:, 1::2].set(tokens != prev_tok)
    skip = skip.at[:, 1].set(False)  # s=1 has no s-2 predecessor
    return states, skip


@functools.partial(jax.jit, static_argnames=("blank_id",))
def ctc_forward_scores(
    log_probs: jnp.ndarray,   # [T, V] float32
    t_valid: jnp.ndarray,     # scalar int32 — true frame count (<= T)
    tokens: jnp.ndarray,      # [C, L] int32, zero-padded
    lengths: jnp.ndarray,     # [C] int32 — true token counts
    blank_id: int,
) -> jnp.ndarray:
    """Length-normalized CTC NLL of every candidate against one log-prob
    matrix. Returns [C] float32; +inf marks infeasible (2L+1 > t_valid or
    L == 0).

    Formulation: the [T, C, L] label-emission gather happens ONCE outside
    the time scan (XLA vectorizes it along L), so each scan step is pure
    elementwise work on the odd/even lattice halves — no per-step gathers.
    alpha is carried split into blank states [C, L+1] and label states
    [C, L]."""
    t_total, _v = log_probs.shape
    c, l = tokens.shape

    # Emissions: lp_lab[t, c, k] = log_probs[t, tokens[c, k]]; lp_blk[t].
    lp_lab = jnp.take_along_axis(
        log_probs[:, None, :], tokens[None, :, :], axis=2
    )                                               # [T, C, L]
    lp_blk = log_probs[:, blank_id]                 # [T]

    k_idx = jnp.arange(l)[None, :]                  # [1, L]
    valid_lab = k_idx < lengths[:, None]            # [C, L]
    valid_blk = jnp.arange(l + 1)[None, :] <= lengths[:, None]  # [C, L+1]

    # skip transition allowed into label state k: tokens[k] != tokens[k-1]
    prev_tok = jnp.concatenate(
        [jnp.full((c, 1), -1, tokens.dtype), tokens[:, :-1]], axis=1
    )
    skip = (tokens != prev_tok) & (k_idx > 0)       # [C, L]

    # t = 0: blank state 0 and label state 0 reachable.
    a_blk0 = jnp.where(
        (jnp.arange(l + 1)[None, :] == 0) & valid_blk, lp_blk[0], NEG_INF
    )
    a_lab0 = jnp.where((k_idx == 0) & valid_lab, lp_lab[0], NEG_INF)

    def step(carry, xs):
        a_blk, a_lab = carry                        # [C, L+1], [C, L]
        lab_t, blk_t, t = xs                        # [C, L], scalar, scalar
        # blank state b_k (k=0..L): from itself and label state k-1.
        lab_shift = jnp.concatenate(
            [jnp.full((c, 1), NEG_INF, a_lab.dtype), a_lab], axis=1
        )                                           # [C, L+1]
        new_blk = jnp.where(
            valid_blk, jnp.logaddexp(a_blk, lab_shift) + blk_t, NEG_INF
        )
        # label state l_k: from itself, blank k, and label k-1 when skip.
        lab_prev = jnp.concatenate(
            [jnp.full((c, 1), NEG_INF, a_lab.dtype), a_lab[:, :-1]], axis=1
        )
        total = jnp.logaddexp(a_lab, a_blk[:, :l])
        total = jnp.logaddexp(total, jnp.where(skip, lab_prev, NEG_INF))
        new_lab = jnp.where(valid_lab, total + lab_t, NEG_INF)
        # Past the true frame count the step is the identity.
        live = t < t_valid
        return (
            jnp.where(live, new_blk, a_blk),
            jnp.where(live, new_lab, a_lab),
        ), None

    ts = jnp.arange(1, t_total)
    (a_blk, a_lab), _ = jax.lax.scan(
        step, (a_blk0, a_lab0), (lp_lab[1:], lp_blk[1:], ts)
    )

    final_blank = jnp.take_along_axis(a_blk, lengths[:, None], axis=1)[:, 0]
    final_label = jnp.take_along_axis(
        a_lab, jnp.maximum(lengths - 1, 0)[:, None], axis=1
    )[:, 0]
    final = jnp.logaddexp(
        final_blank, jnp.where(lengths > 0, final_label, NEG_INF)
    )

    feasible = (2 * lengths + 1 <= t_valid) & (lengths > 0)
    norm = -final / jnp.maximum(lengths.astype(log_probs.dtype), 1.0)
    return jnp.where(feasible, norm, jnp.inf)


@functools.partial(jax.jit, static_argnames=("blank_id",))
def ctc_forward_scores_batch(
    log_probs: jnp.ndarray,   # [B, T, V]
    t_valid: jnp.ndarray,     # [B]
    tokens: jnp.ndarray,      # [C, L]
    lengths: jnp.ndarray,     # [C]
    blank_id: int,
) -> jnp.ndarray:
    """vmap over B independent log-prob matrices → [B, C] scores.
    Used by batched TTA (3 speed variants against the same candidates) and
    whole-corpus eval."""
    return jax.vmap(
        lambda lp, tv: ctc_forward_scores(lp, tv, tokens, lengths, blank_id)
    )(log_probs, t_valid)


def greedy_ids(log_probs: np.ndarray) -> np.ndarray:
    """Per-frame argmax token ids (host side; the argmax itself typically
    arrives from the device already reduced)."""
    return np.asarray(log_probs).argmax(axis=-1)


def collapse_ctc(ids, blank_id: int) -> list[int]:
    """CTC collapse: drop repeats then blanks (reference semantics:
    c2c-direct/run.py:187-204, worker/text-ctc-decode.ts:26-57)."""
    ids = np.asarray(ids)
    if ids.size == 0:
        return []
    keep = np.ones(len(ids), dtype=bool)
    keep[1:] = ids[1:] != ids[:-1]
    deduped = ids[keep]
    return deduped[deduped != blank_id].tolist()


# Padding helpers ------------------------------------------------------------

def _next_bucket(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1] if n <= buckets[-1] else int(np.ceil(n / buckets[-1])) * buckets[-1]


# Bucket ladders are deliberately coarse: every distinct (T, C, L) triple is
# one XLA program, and the tunneled-TPU environment cannot persist compiled
# programs across processes — fewer shapes means a short warmup covers the
# whole serving envelope. The token ladder is 2 rungs (was 3): on the
# tunneled backend a dispatch costs ~a network round trip, so one padded
# L=128 pass beats three tight (32/128/512) passes — the extra lattice
# work is MXU-cheap, the extra round trips are not (BENCH_r02 analysis).
# TILAWA_TOKEN_BUCKETS overrides (e.g. "32,128,512" for CPU-backend
# harness runs, where the padded lattice is compute-bound rather than
# dispatch-bound).
import os as _os

def _parse_buckets(raw: str) -> tuple[int, ...]:
    # Defensive parse (ADVICE r3): _next_bucket assumes an ascending
    # ladder of positive ints, so sort, dedupe, and fail with the env-var
    # name on malformed input rather than a bare ValueError at import of
    # every module.
    try:
        vals = sorted({int(x) for x in raw.split(",") if x.strip()})
    except ValueError as e:
        raise ValueError(
            f"TILAWA_TOKEN_BUCKETS must be comma-separated ints, got {raw!r}"
        ) from e
    if not vals or vals[0] <= 0:
        raise ValueError(
            f"TILAWA_TOKEN_BUCKETS must be positive ints, got {raw!r}"
        )
    return tuple(vals)


TOKEN_BUCKETS = _parse_buckets(_os.getenv("TILAWA_TOKEN_BUCKETS", "128,512"))
CAND_BUCKETS = (512,)
FRAME_BUCKETS = (512, 1024, 2048, 4096)


def pad_candidates(
    token_lists: list[list[int]],
    token_buckets: tuple[int, ...] = TOKEN_BUCKETS,
    cand_buckets: tuple[int, ...] = CAND_BUCKETS,
) -> tuple[np.ndarray, np.ndarray]:
    """Pad a ragged candidate token list to bucketed [C_pad, L_pad] int32 +
    lengths [C_pad]. Bucketing caps the number of distinct XLA program
    shapes (compile-once, reuse-everywhere)."""
    c = len(token_lists)
    lmax = max((len(t) for t in token_lists), default=1)
    l_pad = _next_bucket(max(lmax, 1), token_buckets)
    c_pad = _next_bucket(max(c, 1), cand_buckets)
    tokens = np.zeros((c_pad, l_pad), dtype=np.int32)
    lengths = np.zeros(c_pad, dtype=np.int32)
    for i, ids in enumerate(token_lists):
        tokens[i, : len(ids)] = ids
        lengths[i] = len(ids)
    return tokens, lengths


def pad_frames(
    log_probs: np.ndarray, frame_buckets: tuple[int, ...] = FRAME_BUCKETS
) -> tuple[np.ndarray, int]:
    """Pad [T, V] log-probs to a bucketed frame count; returns (padded, T)."""
    t, v = log_probs.shape
    t_pad = _next_bucket(t, frame_buckets)
    if t_pad == t:
        return log_probs, t
    out = np.full((t_pad, v), 0.0, dtype=log_probs.dtype)
    out[:t] = log_probs
    return out, t
