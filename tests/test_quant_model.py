"""Quantized FastConformer: fp → int4 conversion and forward parity.

The converted model must (a) load the packed variables at the same module
paths, (b) produce log-probs close to the fp model (int4 block-quant
noise), and (c) keep greedy argmax decisions stable on smooth inputs.
CPU backend → use_pallas=False (the XLA dequant path; kernel parity with
Pallas is covered in tests/test_quant.py via interpret mode).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tilawa_tpu.models.fastconformer import (
    FastConformerConfig,
    FastConformerCTC,
    Int4Dense,
)
from tilawa_tpu.train.quantize import (

    packed_size_bytes,
    quantize_variables,
    quantized_config,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fp_setup():
    cfg = FastConformerConfig.small(dropout=0.0)
    model = FastConformerCTC(cfg)
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 16000)) * 0.1
    lengths = jnp.array([16000, 12000], jnp.int32)
    variables = model.init(rng, audio, lengths)
    lp, enc_lens = model.apply(variables, audio, lengths)
    return cfg, variables, audio, lengths, np.asarray(lp), np.asarray(enc_lens)


class TestInt4Dense:
    def test_init_and_forward(self):
        cfg = FastConformerConfig.small(quant="int4", use_pallas=False)
        layer = Int4Dense(96, cfg=cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 64))
        vs = layer.init(jax.random.PRNGKey(1), x)
        p = vs["params"]
        assert p["packed"].shape == (32, 96) and p["packed"].dtype == jnp.uint8
        assert p["scales"].shape == (64 // 32, 96)
        y = layer.apply(vs, x)
        assert y.shape == (4, 96)
        assert np.isfinite(np.asarray(y)).all()

    def test_odd_fan_in_rejected(self):
        cfg = FastConformerConfig.small(quant="int4", use_pallas=False)
        layer = Int4Dense(8, cfg=cfg)
        x = jnp.zeros((2, 7))
        with pytest.raises(ValueError):
            layer.init(jax.random.PRNGKey(0), x)


class TestQuantizedModel:
    def test_variables_convert_and_load(self, fp_setup):
        cfg, variables, audio, lengths, lp_fp, enc_lens_fp = fp_setup
        qcfg = quantized_config(cfg, use_pallas=False)
        qvars = quantize_variables(variables)
        qmodel = FastConformerCTC(qcfg)
        lp_q, enc_lens_q = qmodel.apply(qvars, audio, lengths)
        lp_q = np.asarray(lp_q)
        assert lp_q.shape == lp_fp.shape
        np.testing.assert_array_equal(np.asarray(enc_lens_q), enc_lens_fp)
        # int4 quantization noise: log-prob drift bounded, valid distribution
        assert np.isfinite(lp_q).all()
        np.testing.assert_allclose(
            np.exp(lp_q).sum(-1), 1.0, atol=1e-3
        )

    def test_quantized_close_to_fp(self, fp_setup):
        cfg, variables, audio, lengths, lp_fp, enc_lens = fp_setup
        qcfg = quantized_config(cfg, use_pallas=False)
        qvars = quantize_variables(variables)
        lp_q = np.asarray(FastConformerCTC(qcfg).apply(qvars, audio, lengths)[0])
        # compare on valid frames of sample 0
        t = int(enc_lens[0])
        drift = np.abs(lp_q[0, :t] - lp_fp[0, :t]).mean()
        assert drift < 1.0  # random-init logits are near-uniform; drift stays small

    def test_param_paths_identical(self, fp_setup):
        cfg, variables, *_ = fp_setup
        qvars = quantize_variables(variables)

        def module_paths(tree, prefix=()):
            for k, v in tree.items():
                if isinstance(v, dict):
                    yield from module_paths(v, prefix + (k,))
                else:
                    yield prefix

        fp_modules = set(module_paths(variables["params"]))
        q_modules = set(module_paths(qvars["params"]))
        assert fp_modules == q_modules

    def test_size_reduction(self, fp_setup):
        cfg, variables, *_ = fp_setup
        qvars = quantize_variables(variables)
        fp_bytes = packed_size_bytes(variables["params"])
        q_bytes = packed_size_bytes(qvars["params"])
        # matmuls dominate; expect a substantial cut even at test scale
        assert q_bytes < 0.45 * fp_bytes

    def test_scan_stacked_kernels_packed(self, fp_setup):
        cfg, variables, *_ = fp_setup
        qvars = quantize_variables(variables)
        blocks = qvars["params"]["blocks"]["block"]
        lin1 = blocks["ff1"]["lin1"]
        assert lin1["packed"].ndim == 3  # [L, K//2, N]
        assert lin1["packed"].shape[0] == cfg.num_layers
        assert lin1["scales"].ndim == 3


class TestMixedQuant:
    def test_mixed_forward_close_to_fp(self, fp_setup):
        cfg, variables, audio, lengths, lp_fp, enc_fp = fp_setup
        qvars = quantize_variables(variables, mode="mixed")
        qcfg = quantized_config(cfg, mode="mixed", use_pallas=False)
        qmodel = FastConformerCTC(qcfg)
        lp, enc = qmodel.apply(qvars, audio, lengths)
        assert (np.asarray(enc) == enc_fp).all()
        # FFN int4 + int8 elsewhere: tighter than all-int4, looser than fp
        diff = np.abs(np.asarray(lp) - lp_fp).max()
        assert np.isfinite(diff)
        agree = (
            np.asarray(lp)[0, : enc_fp[0]].argmax(-1)
            == lp_fp[0, : enc_fp[0]].argmax(-1)
        ).mean()
        # random-init logits are near-uniform, so argmax flips easily
        # under quant noise; real-checkpoint parity is measured on-chip
        assert agree > 0.8, agree

    def test_mixed_smaller_than_int8_bigger_than_int4(self, fp_setup):
        cfg, variables, *_ = fp_setup
        s4 = packed_size_bytes(quantize_variables(variables, mode="int4"))
        s8 = packed_size_bytes(quantize_variables(variables, mode="int8"))
        sm = packed_size_bytes(quantize_variables(variables, mode="mixed"))
        assert s4 < sm < s8

    def test_mixed_leaf_structure(self, fp_setup):
        cfg, variables, *_ = fp_setup
        q = quantize_variables(variables, mode="mixed")["params"]

        def walk(tree, path=""):
            for k, v in tree.items():
                if isinstance(v, dict):
                    if "packed" in v:
                        yield path + k, "int4"
                    elif "q" in v:
                        yield path + k, "int8"
                    else:
                        yield from walk(v, path + k + "/")

        kinds = dict(walk(q))
        assert any(k.endswith("lin1") and m == "int4" for k, m in kinds.items())
        assert all(
            m == "int8" for k, m in kinds.items()
            if k.rsplit("/", 1)[-1] in ("q", "k", "v", "out", "ctc_head")
        )
