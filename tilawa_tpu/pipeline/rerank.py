"""CTC forced-alignment rerank of retrieval candidates on the device.

Equivalent of the reference's batched F.ctc_loss rerank (reference:
experiments/c2c-direct/run.py:314-380: feasibility 2L+1 <= T, length
normalization, SPAN_PENALTY per extra verse, final_score =
-norm_loss + TEXT_WEIGHT*text_score - penalty) — but as ONE bucketed XLA
dispatch over all candidates instead of torch batches of 16.
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp
import numpy as np

from tilawa_tpu.data.assets import BLANK_ID
from tilawa_tpu.data.token_store import TokenStore
from tilawa_tpu.ops.ctc import ctc_forward_scores, pad_candidates, pad_frames

SPAN_PENALTY = float(os.getenv("TILAWA_SPAN_PENALTY", "0.5"))
TEXT_WEIGHT = float(os.getenv("TILAWA_TEXT_WEIGHT", "0.0"))


def span_len(c: dict) -> int:
    return (c.get("ayah_end") or c["ayah"]) - c["ayah"] + 1


def ctc_rerank(
    log_probs: np.ndarray,
    t_valid: int,
    candidates: list[dict],
    token_store: TokenStore,
    blank_id: int = BLANK_ID,
    span_penalty: float = SPAN_PENALTY,
    text_weight: float = TEXT_WEIGHT,
) -> list[dict]:
    """Annotate candidates with ctc_norm_loss/final_score; return the
    feasible ones sorted best-first."""
    if not candidates:
        return []

    token_lists = [token_store.ids_for_candidate(c) for c in candidates]
    tokens, lengths = pad_candidates(token_lists)
    lp_padded, t = pad_frames(np.asarray(log_probs[:t_valid], dtype=np.float32))

    scores = np.asarray(
        ctc_forward_scores(
            jnp.asarray(lp_padded),
            jnp.int32(t),
            jnp.asarray(tokens),
            jnp.asarray(lengths),
            blank_id,
        )
    )

    for i, cand in enumerate(candidates):
        norm_loss = float(scores[i])
        cand["ctc_len"] = len(token_lists[i])
        if math.isfinite(norm_loss):
            cand["ctc_norm_loss"] = norm_loss
            cand["ctc_loss"] = norm_loss * max(len(token_lists[i]), 1)
            text_score = float(cand.get("score") or 0.0)
            penalty = span_penalty * (span_len(cand) - 1)
            cand["final_score"] = -norm_loss + text_weight * text_score - penalty
        else:
            cand["ctc_norm_loss"] = float("inf")
            cand["ctc_loss"] = float("inf")
            cand["final_score"] = -float("inf")

    ranked = [c for c in candidates if math.isfinite(c["ctc_norm_loss"])]
    ranked.sort(key=lambda c: c["final_score"], reverse=True)
    return ranked
