"""int4/int8 quantization: packing round-trips and dequantizing matmuls.

The Pallas kernels run in interpreter mode here (CPU test backend); the
XLA fallback is the numerics oracle. Tolerances reflect int4 (4-bit,
block-128 scales) and int8 (per-channel) quantization error on random
gaussian weights.
"""

import numpy as np
import pytest

from tilawa_tpu.ops.quant import (

    INT4_BLOCK,
    dequantize_int8,
    int4_matmul,
    int4_matmul_xla,
    int8_matmul,
    int8_matmul_xla,
    pack_int4,
    quantize_int8,
    unpack_int4,
)

pytestmark = pytest.mark.slow


def _rand_w(k, n, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((k, n)) * scale).astype(np.float32)


class TestPacking:
    def test_int4_roundtrip_error_bounded(self):
        w = _rand_w(512, 256)
        packed, scales = pack_int4(w)
        assert packed.shape == (256, 256) and packed.dtype == np.uint8
        assert scales.shape == (512 // INT4_BLOCK, 256)
        w2 = unpack_int4(packed, scales)
        # max error <= scale/2 per element
        per_elem_bound = np.repeat(scales, INT4_BLOCK, axis=0) * 0.5 + 1e-9
        assert np.all(np.abs(w2 - w) <= per_elem_bound)

    def test_int4_exact_on_grid(self):
        # weights already on the quantization grid round-trip exactly
        scales = 0.01
        q = np.random.default_rng(1).integers(-7, 8, size=(256, 128))
        q[::INT4_BLOCK] = 7  # pin the per-block max so scale = 7*0.01/7 exactly
        w = (q * scales).astype(np.float32)
        packed, s = pack_int4(w)
        w2 = unpack_int4(packed, s)
        np.testing.assert_allclose(w2, w, atol=1e-7)

    def test_int4_odd_k_rejected(self):
        with pytest.raises(ValueError):
            pack_int4(_rand_w(257, 128))

    def test_int8_roundtrip(self):
        w = _rand_w(64, 32)
        q, scales = quantize_int8(w)
        assert q.dtype == np.int8 and scales.shape == (32,)
        w2 = dequantize_int8(q, scales)
        assert np.max(np.abs(w2 - w)) <= scales.max() * 0.5 + 1e-9


class TestMatmul:
    def test_int4_xla_matches_dequant(self):
        w = _rand_w(256, 384)
        x = _rand_w(16, 256, seed=7, scale=1.0)
        packed, scales = pack_int4(w)
        ref = x @ unpack_int4(packed, scales)
        out = np.asarray(int4_matmul_xla(x, packed, scales))
        # bf16 matmul tolerance
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)

    def test_int4_pallas_matches_xla(self):
        w = _rand_w(256, 384, seed=2)
        x = _rand_w(24, 256, seed=8, scale=1.0)
        packed, scales = pack_int4(w)
        ref = np.asarray(int4_matmul_xla(x, packed, scales))
        out = np.asarray(int4_matmul(x, packed, scales, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    def test_int4_pallas_ragged_shapes(self):
        # M and N not multiples of the tiles; K = 2 blocks
        w = _rand_w(256, 300, seed=3)
        x = _rand_w(13, 256, seed=9, scale=1.0)
        packed, scales = pack_int4(w)
        ref = np.asarray(int4_matmul_xla(x, packed, scales))
        out = np.asarray(int4_matmul(x, packed, scales, interpret=True))
        assert out.shape == (13, 300)
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    def test_int4_batched_lead_dims(self):
        w = _rand_w(128, 128, seed=4)
        x = _rand_w(2 * 5, 128, seed=10, scale=1.0).reshape(2, 5, 128)
        packed, scales = pack_int4(w)
        out = np.asarray(int4_matmul(x, packed, scales, interpret=True))
        assert out.shape == (2, 5, 128)
        ref = np.asarray(int4_matmul_xla(x.reshape(10, 128), packed, scales))
        np.testing.assert_allclose(out.reshape(10, 128), ref, atol=1e-4, rtol=1e-4)

    def test_int8_pallas_matches_xla(self):
        w = _rand_w(192, 256, seed=5)
        x = _rand_w(10, 192, seed=11, scale=1.0)
        q, scales = quantize_int8(w)
        ref = np.asarray(int8_matmul_xla(x, q, scales))
        out = np.asarray(int8_matmul(x, q, scales, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    def test_int4_accuracy_vs_fp(self):
        # end-to-end quantization error on a realistic activation scale
        w = _rand_w(512, 512, seed=6)
        x = _rand_w(32, 512, seed=12, scale=1.0)
        packed, scales = pack_int4(w)
        ref = x @ w
        out = np.asarray(int4_matmul_xla(x, packed, scales))
        rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
        # int4 RMS quantization noise on zero-mean gaussian outputs is
        # ~step/sqrt(12) ≈ 0.1σ_w relative — 12% is the theoretical regime.
        assert rel < 0.12
