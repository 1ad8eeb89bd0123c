"""Post-training quantization: fp checkpoint → packed int4 variables.

The converter role of the reference's export tooling (reference:
experiments/c2c-direct-mixed/run.py:6-8 MatMulNBitsQuantizer int4 +
quantize_dynamic QInt8; scripts/export_onnx.py). Walks a trained fp
parameter tree and replaces every eligible Dense kernel with the packed
int4 representation consumed by models.fastconformer.Int4Dense; the
resulting variables load into a model built with cfg.quant="int4"
(identical module paths — only the leaf params change).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from tilawa_tpu.models.fastconformer import FastConformerConfig
from tilawa_tpu.ops.quant import INT4_BLOCK, pack_int4, unpack_int4

# Module names whose `kernel` is a matmul weight (rank-2, or rank-3 when
# scan-stacked over layers). Convs/LayerNorms are not in this set.
ELIGIBLE_DENSE = {
    "lin1", "lin2",          # feed-forward pair
    "q", "k", "v", "pos", "out",  # attention projections
    "pw1", "pw2",            # conv-module pointwise matmuls
    "proj",                  # subsampling output projection
    "ctc_head",
}


def _pack_kernel(kern: np.ndarray, block: int) -> tuple[np.ndarray, np.ndarray]:
    if kern.ndim == 2:
        return pack_int4(kern, block)
    # scan-stacked [L, K, N]: pack each layer slice
    packed, scales = zip(*(pack_int4(kern[i], block) for i in range(kern.shape[0])))
    return np.stack(packed), np.stack(scales)


def quantize_params(
    params: dict, block: int = INT4_BLOCK, mode: str = "int4"
) -> dict:
    out = {}
    for name, sub in params.items():
        if (
            name in ELIGIBLE_DENSE
            and isinstance(sub, dict)
            and "kernel" in sub
        ):
            kern = np.asarray(sub["kernel"])
            leaf_mode = mode
            if mode == "mixed":
                # reference recipe shape: int4 on the MatMul bulk, int8 on
                # the decision-critical rest (models.fastconformer
                # MIXED_INT4_NAMES; c2c-direct-mixed/run.py:6-8)
                from tilawa_tpu.models.fastconformer import MIXED_INT4_NAMES

                leaf_mode = "int4" if name in MIXED_INT4_NAMES else "int8"
            if leaf_mode == "int8":
                from tilawa_tpu.ops.quant import quantize_int8

                q, scales = quantize_int8(kern)
                entry = {"q": jnp.asarray(q), "scales": jnp.asarray(scales)}
            else:
                packed, scales = _pack_kernel(kern, block)
                entry = {
                    "packed": jnp.asarray(packed),
                    "scales": jnp.asarray(scales),
                }
            if "bias" in sub:
                entry["bias"] = sub["bias"]
            out[name] = entry
        elif isinstance(sub, dict):
            out[name] = quantize_params(sub, block, mode)
        else:
            out[name] = sub
    return out


def quantize_variables(
    variables: dict, block: int = INT4_BLOCK, mode: str = "int4"
) -> dict:
    new = dict(variables)
    new["params"] = quantize_params(dict(variables["params"]), block, mode)
    return new


def quantized_config(
    config: FastConformerConfig, mode: str = "int4", **overrides
) -> FastConformerConfig:
    return dataclasses.replace(config, quant=mode, **overrides)


def _unpack_kernel(packed: np.ndarray, scales: np.ndarray, block: int) -> np.ndarray:
    if packed.ndim == 2:
        return unpack_int4(packed, scales, block)
    # scan-stacked [L, K//2, N]
    return np.stack(
        [unpack_int4(packed[i], scales[i], block) for i in range(packed.shape[0])]
    )


def dequantize_params(params: dict, block: int = INT4_BLOCK) -> dict:
    """Inverse of quantize_params: packed int4 leaves back to fp32 kernels.
    The round trip is lossy (that's the point of int4) — used to warm-start
    continuation training when only a quantized export survives."""
    out = {}
    for name, sub in params.items():
        if isinstance(sub, dict) and "packed" in sub and "scales" in sub:
            entry = {
                "kernel": jnp.asarray(
                    _unpack_kernel(
                        np.asarray(sub["packed"]), np.asarray(sub["scales"]), block
                    )
                )
            }
            if "bias" in sub:
                entry["bias"] = sub["bias"]
            out[name] = entry
        elif isinstance(sub, dict) and "q" in sub and "scales" in sub:
            from tilawa_tpu.ops.quant import dequantize_int8

            entry = {
                "kernel": jnp.asarray(
                    dequantize_int8(np.asarray(sub["q"]), np.asarray(sub["scales"]))
                )
            }
            if "bias" in sub:
                entry["bias"] = sub["bias"]
            out[name] = entry
        elif isinstance(sub, dict):
            out[name] = dequantize_params(sub, block)
        else:
            out[name] = sub
    return out


def dequantize_variables(variables: dict, block: int = INT4_BLOCK) -> dict:
    new = dict(variables)
    new["params"] = dequantize_params(dict(variables["params"]), block)
    return new


def dequantized_config(config: FastConformerConfig, **overrides) -> FastConformerConfig:
    return dataclasses.replace(config, quant=None, **overrides)


def packed_size_bytes(variables: dict) -> int:
    """Total serialized parameter bytes (the reference tracks model_size();
    README.md:189 — 88 MB for the mixed export)."""
    import jax

    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(variables)
        if hasattr(leaf, "dtype")
    )
