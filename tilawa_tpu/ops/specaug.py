"""SpecAugment: time/frequency masking on mel features, in-graph.

The reference trains with NeMo's SpecAugment defaults on ~126K clips
(reference: scripts/train_fastconformer_phoneme_modal.py Lightning
config); our corpus is ~342 clips, so feature masking is the main
defense against the full-utterance memorization that makes partial
streaming windows out-of-distribution (measured: prefix decode WER ~0.98
at 1-5 s while full-clip WER is 0.33 — eval/context_sweep.py).

TPU-first: static shapes throughout — masks are built from iota
comparisons and composed with jnp.any over a fixed mask count; widths
and starts are sampled with jax.random.uniform and scaled by the
per-example valid length (no dynamic-shape ops, safe under vmap+jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _interval_mask(axis_size: int, starts: jnp.ndarray, widths: jnp.ndarray):
    """[axis_size] bool — True where any [start, start+width) interval covers."""
    iota = jnp.arange(axis_size)
    hit = (iota[None, :] >= starts[:, None]) & (
        iota[None, :] < (starts + widths)[:, None]
    )
    return jnp.any(hit, axis=0)


def spec_augment(
    feats: jnp.ndarray,        # [B, T, F]
    lengths: jnp.ndarray,      # [B] valid frame counts
    rng: jax.Array,
    freq_masks: int = 2,
    freq_width: int = 27,
    time_masks: int = 10,
    time_frac: float = 0.05,
    mask_value: float = 0.0,
) -> jnp.ndarray:
    """Mask `freq_masks` random mel bands and `time_masks` random time
    stripes (each up to `time_frac` of the example's valid length)."""
    if freq_masks == 0 and time_masks == 0:
        return feats
    b, t, f = feats.shape

    def one(x, length, key):
        kf1, kf2, kt1, kt2 = jax.random.split(key, 4)
        masked = x
        if freq_masks:
            fw = (
                jax.random.uniform(kf1, (freq_masks,)) * (freq_width + 1)
            ).astype(jnp.int32)
            fs = (
                jax.random.uniform(kf2, (freq_masks,))
                * jnp.maximum(f - fw, 1).astype(jnp.float32)
            ).astype(jnp.int32)
            fmask = _interval_mask(f, fs, fw)
            masked = jnp.where(fmask[None, :], mask_value, masked)
        if time_masks:
            max_w = jnp.maximum(
                (length.astype(jnp.float32) * time_frac), 1.0
            )
            tw = (
                jax.random.uniform(kt1, (time_masks,)) * (max_w + 1.0)
            ).astype(jnp.int32)
            ts = (
                jax.random.uniform(kt2, (time_masks,))
                * jnp.maximum(length - tw, 1).astype(jnp.float32)
            ).astype(jnp.int32)
            tmask = _interval_mask(t, ts, tw)
            # never mask beyond the valid length (padding is already zero)
            tmask = tmask & (jnp.arange(t) < length)
            masked = jnp.where(tmask[:, None], mask_value, masked)
        return masked

    keys = jax.random.split(rng, b)
    return jax.vmap(one)(feats, lengths, keys)
