"""Weight quantization: int4/int8 packing + dequantizing matmul kernels.

The reference's champion model ships as an 88 MB mixed-precision ONNX
export: int4 block-quantized MatMul weights (MatMulNBitsQuantizer) plus
dynamic-int8 Conv/LayerNorm (reference: experiments/c2c-direct-mixed/
run.py:6-8, README.md:189, export_metadata.json). On TPU the equivalent is
weights stored packed in HBM and dequantized on the fly inside a Pallas
kernel feeding the MXU — the bandwidth saving (8x vs f32 for int4) is the
point, since HBM bandwidth, not FLOPs, bounds this model.

Layout (int4): weights [K, N] are split-half packed along K — byte row k2
holds k = k2 in the low nibble and k = k2 + K/2 in the high nibble, so
in-kernel unpacking is two nibble extractions and one concatenate (no
interleave, which TPUs reshuffle poorly). Scales are symmetric, per
(K-block, output-column), block aligned to the 128-lane tile.

Both matmuls have a pure-XLA fallback (`*_xla`) used on CPU and as the
numerics oracle for the Pallas path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT4_BLOCK = 32  # K rows per scale group (MatMulNBits default block_size)


# --------------------------------------------------------------------------
# Packing / unpacking (host-side, numpy)
# --------------------------------------------------------------------------

def pack_int4(w: np.ndarray, block: int = INT4_BLOCK) -> tuple[np.ndarray, np.ndarray]:
    """[K, N] float → (packed uint8 [K//2, N], scales f32 [ceil(K/block), N]).

    Symmetric per-(block, column) quantization to [-7, 7]; K must be even
    and block must divide K/2 (both hold for every matmul in the model
    after padding).
    """
    w = np.asarray(w, dtype=np.float32)
    k, n = w.shape
    if k % 2:
        raise ValueError(f"K must be even, got {k}")
    kb = -(-k // block)
    pad_k = kb * block - k
    if pad_k:
        w = np.concatenate([w, np.zeros((pad_k, n), np.float32)], axis=0)
        k = w.shape[0]
    if (k // 2) % block and kb > 1:
        raise ValueError(f"block {block} must divide K/2 = {k // 2}")

    grouped = w.reshape(kb, block, n)
    scales = np.abs(grouped).max(axis=1) / 7.0  # [KB, N]
    scales = np.maximum(scales, 1e-12).astype(np.float32)
    q = np.clip(np.rint(grouped / scales[:, None, :]), -7, 7).astype(np.int8)
    q = q.reshape(k, n)

    half = k // 2
    lo = q[:half] & 0xF
    hi = q[half:] & 0xF
    packed = (lo | (hi << 4)).astype(np.uint8)
    return packed, scales


def unpack_int4(
    packed: np.ndarray, scales: np.ndarray, block: int = INT4_BLOCK
) -> np.ndarray:
    """Inverse of pack_int4 → dequantized f32 [K, N]."""
    packed = np.asarray(packed)
    lo = ((packed & 0xF).astype(np.int8) ^ 8) - 8
    hi = ((packed >> 4).astype(np.int8) ^ 8) - 8
    q = np.concatenate([lo, hi], axis=0).astype(np.float32)  # [K, N]
    k = q.shape[0]
    rep = np.repeat(np.asarray(scales, np.float32), block, axis=0)[:k]
    return q * rep


def quantize_int8(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[..., K, N] float → (int8 values, per-output-column f32 scales [..., N]).
    Symmetric per-channel, the dynamic-quantization analogue
    (reference: scripts/quantize_pruned_models.py:85-88 quantize_dynamic QInt8)."""
    w = np.asarray(w, dtype=np.float32)
    scales = np.maximum(np.abs(w).max(axis=-2) / 127.0, 1e-12).astype(np.float32)
    q = np.clip(np.rint(w / scales[..., None, :]), -127, 127).astype(np.int8)
    return q, scales


def dequantize_int8(q: np.ndarray, scales: np.ndarray) -> np.ndarray:
    return np.asarray(q, np.float32) * np.asarray(scales, np.float32)[..., None, :]


# --------------------------------------------------------------------------
# XLA reference paths (CPU + numerics oracle)
# --------------------------------------------------------------------------

def _unpack_int4_jnp(packed: jnp.ndarray, scales: jnp.ndarray, block: int) -> jnp.ndarray:
    lo = ((packed & 0xF).astype(jnp.int8) ^ 8) - 8
    hi = ((packed >> 4).astype(jnp.int8) ^ 8) - 8
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    rep = jnp.repeat(scales, block, axis=0)[: q.shape[0]]
    return q * rep


def int4_matmul_xla(
    x: jnp.ndarray, packed: jnp.ndarray, scales: jnp.ndarray, block: int = INT4_BLOCK
) -> jnp.ndarray:
    w = _unpack_int4_jnp(packed, scales, block)
    return jnp.dot(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def int8_matmul_xla(x: jnp.ndarray, q: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    w = q.astype(jnp.float32) * scales[..., None, :]
    return jnp.dot(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


# --------------------------------------------------------------------------
# Pallas kernels: packed weights HBM→VMEM, dequant in-registers, MXU matmul
# --------------------------------------------------------------------------

def _int4_kernel(x_ref, p_ref, s_ref, o_ref, *, block: int):
    # nibble math in int32: Mosaic has no i8 vector ALU ops (arith.subi
    # on vXi8 fails to legalize), and i32 unpacking is VPU-native anyway.
    p = p_ref[:].astype(jnp.int32)  # [K//2, TN]
    lo = ((p & 0xF) ^ 8) - 8
    hi = ((p >> 4) ^ 8) - 8
    q = jnp.concatenate([lo, hi], axis=0)  # [K, TN], original row order
    k = q.shape[0]
    s = s_ref[:]  # [KB, TN]
    kb, tn = s.shape
    # element-repeat along K: broadcast then flatten sublanes
    # (pltpu.repeat TILES the array — wrong semantics here)
    scales = jnp.broadcast_to(s[:, None, :], (kb, block, tn)).reshape(kb * block, tn)[:k]
    w = (q.astype(jnp.float32) * scales).astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )


def _int8_kernel(x_ref, q_ref, s_ref, o_ref):
    w = (q_ref[:].astype(jnp.float32) * s_ref[:]).astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("block", "tile_m", "tile_n", "interpret"))
def int4_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scales: jnp.ndarray,
    block: int = INT4_BLOCK,
    tile_m: int = 256,
    tile_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [..., M, K] @ dequant(packed [K//2, N], scales [KB, N]) → [..., M, N].

    Grid tiles M and N; the packed block column rides HBM→VMEM once per
    (i, j) program at int4 width — 1/8 the bytes of an f32 weight load.
    """
    *lead, m, k = x.shape
    n = packed.shape[1]
    x2 = x.reshape(-1, k)
    m_total = x2.shape[0]

    tm = min(tile_m, _round_up(m_total, 8))
    tn = min(tile_n, _round_up(n, 128))
    m_pad = _round_up(m_total, tm)
    n_pad = _round_up(n, tn)
    if m_pad != m_total:
        x2 = jnp.pad(x2, ((0, m_pad - m_total), (0, 0)))
    p = packed if n_pad == n else jnp.pad(packed, ((0, 0), (0, n_pad - n)))
    s = scales if n_pad == n else jnp.pad(scales, ((0, 0), (0, n_pad - n)))

    out = pl.pallas_call(
        functools.partial(_int4_kernel, block=block),
        grid=(m_pad // tm, n_pad // tn),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((packed.shape[0], tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((scales.shape[0], tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n_pad,
            bytes_accessed=m_pad * k * 4 + packed.size + scales.size * 4
            + m_pad * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, p, s)
    return out[:m_total, :n].reshape(*lead, m, n)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "interpret"))
def int8_matmul(
    x: jnp.ndarray,
    q: jnp.ndarray,
    scales: jnp.ndarray,
    tile_m: int = 256,
    tile_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [..., M, K] @ (q [K, N] int8 * scales [N]) → [..., M, N]."""
    *lead, m, k = x.shape
    n = q.shape[1]
    x2 = x.reshape(-1, k)
    m_total = x2.shape[0]

    tm = min(tile_m, _round_up(m_total, 8))
    tn = min(tile_n, _round_up(n, 128))
    m_pad = _round_up(m_total, tm)
    n_pad = _round_up(n, tn)
    if m_pad != m_total:
        x2 = jnp.pad(x2, ((0, m_pad - m_total), (0, 0)))
    qp = q if n_pad == n else jnp.pad(q, ((0, 0), (0, n_pad - n)))
    s2 = scales.reshape(1, -1)
    sp = s2 if n_pad == n else jnp.pad(s2, ((0, 0), (0, n_pad - n)))

    out = pl.pallas_call(
        _int8_kernel,
        grid=(m_pad // tm, n_pad // tn),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n_pad,
            bytes_accessed=m_pad * k * 4 + qp.size + sp.size * 4
            + m_pad * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, qp, sp)
    return out[:m_total, :n].reshape(*lead, m, n)
