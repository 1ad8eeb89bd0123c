"""Chunked long-clip forward: [K, LONG_CHUNK] stitched dispatch.

Covers the routing threshold, chunk-count math, t_valid accounting of the
in-graph junction-trimmed stitch, and agreement of the stitched decode
with the full-clip decode away from junctions (small config, CPU).
"""

import numpy as np
import pytest

from tilawa_tpu.models.fastconformer import (
    FastConformerConfig,
    subsampled_length,
)
from tilawa_tpu.ops.frontend import num_frames
from tilawa_tpu.pipeline.runtime import (
    LONG_CHUNK,
    LONG_STEP,
    LONG_THRESHOLD,
    _JUNCTION_TRIM,
    EncoderRuntime,
)


@pytest.fixture(scope="module")
def runtime():
    return EncoderRuntime(FastConformerConfig.small(), seed=0, long_chunking=True)


def test_chunk_count_boundaries():
    assert EncoderRuntime.chunk_count(LONG_THRESHOLD) == 1
    assert EncoderRuntime.chunk_count(LONG_THRESHOLD + 1) == 2
    assert EncoderRuntime.chunk_count(LONG_STEP + LONG_CHUNK) == 2
    assert EncoderRuntime.chunk_count(LONG_STEP + LONG_CHUNK + 1) == 3
    # chunks always cover the clip
    for n in (300000, 500000, 830000, 1700000):
        k = EncoderRuntime.chunk_count(n)
        assert (k - 1) * LONG_STEP + LONG_CHUNK >= n
        # and the last chunk holds new content beyond the previous one
        assert n - (k - 1) * LONG_STEP > 0


def test_forward_routes_long(runtime):
    rng = np.random.default_rng(0)
    audio = rng.normal(scale=0.1, size=300000).astype(np.float32)  # 18.75 s
    lp, ids, t_valid = runtime.forward(audio)

    k = 2
    tc = subsampled_length(num_frames(LONG_CHUNK))
    last_len = 300000 - LONG_STEP
    t_last = subsampled_length(num_frames(last_len))
    expected = (tc - _JUNCTION_TRIM) + (t_last - _JUNCTION_TRIM)
    assert t_valid == expected
    assert len(ids) == t_valid
    # ~12.5 enc frames/s; stitch trims one junction (~1 s overlap)
    assert abs(t_valid - 300000 / 1280) < 16
    assert lp.shape[0] >= t_valid and lp.shape[1] == runtime.config.vocab_size + 1
    assert k == runtime.chunk_count(300000)


def test_streaming_cache_matches_forward_long(runtime):
    """Growing-window cache path must be numerically identical to the
    uncached chunked forward (same per-chunk normalization, same stitch),
    and must actually hit the cache as the window grows."""
    from tilawa_tpu.pipeline.runtime import StreamingEncoderCache

    rng = np.random.default_rng(2)
    full = rng.normal(scale=0.1, size=560000).astype(np.float32)  # 35 s

    cache = StreamingEncoderCache(runtime)
    for n in (280000, 400000, 520000, 560000):   # growing discovery window
        lp_c, ids_c, tv_c = cache.forward(full[:n])
        lp_f, ids_f, tv_f = runtime.forward_long(full[:n])
        assert tv_c == tv_f
        assert list(ids_c) == list(ids_f)
        assert np.allclose(
            np.asarray(lp_c[:tv_c]), np.asarray(lp_f[:tv_f]), atol=1e-5
        )
    assert cache.hits >= 3  # chunk 0 re-used on every later cycle
    # short windows route through the plain forward
    lp_s, ids_s, tv_s = cache.forward(full[:200000])
    assert tv_s > 0 and len(ids_s) == tv_s


def test_stitched_timeline_vs_full(runtime):
    """The stitched timeline must lose exactly 2*trim frames per junction
    relative to the full-clip forward, and produce proper log-probs.

    (Frame-level argmax agreement with the full path is NOT asserted here:
    per-feature mel normalization uses utterance-level statistics, so a
    16 s chunk and the 20 s clip normalize differently — with random
    weights that flips argmaxes everywhere. Decode-level fidelity is
    validated on the trained champion by the v1 accuracy eval.)"""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    audio = rng.normal(scale=0.1, size=320000).astype(np.float32)  # 20 s

    lp_c, ids_c, tv_c = runtime.forward_long(audio)
    _lp_f, lens_f, _ids_f = runtime.forward_batch([audio])
    tv_f = int(lens_f[0])

    # stitched timeline ~= full timeline (overlap counted once, junction
    # trim 2*6 frames vs ~12.5 overlap frames -> ±2 rounding slack)
    assert abs(tv_f - tv_c) <= 2
    # valid rows are normalized log-probs
    row = np.asarray(lp_c[: tv_c])
    sums = np.exp(row).sum(axis=-1)
    assert np.all(np.isfinite(row))
    assert np.allclose(sums, 1.0, atol=1e-3)
    assert len(ids_c) == tv_c
