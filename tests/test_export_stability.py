"""Export bundle contract + stability/determinism report."""

import json

import jax
import jax.numpy as jnp
import pytest

from tilawa_tpu.models.fastconformer import FastConformerConfig, FastConformerCTC
from tilawa_tpu.train.checkpoint import save_variables
from tilawa_tpu.train.export import export_bundle, verify_bundle

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def small_checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt") / "run0"
    cfg = FastConformerConfig.small(dropout=0.0)
    model = FastConformerCTC(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32000), jnp.float32),
        jnp.array([32000], jnp.int32),
    )
    save_variables(d, cfg, variables)
    return d


class TestExport:
    def test_export_int4_bundle(self, small_checkpoint, tmp_path):
        out = export_bundle(small_checkpoint, tmp_path / "bundle", int4=True)
        meta = json.loads((out / "export_metadata.json").read_text())
        assert meta["model_notes"]["quant"] == "int4"
        assert meta["config"]["quant"] == "int4"
        assert meta["blank_id"] == meta["vocab_tokens"] - 1
        assert (out / "variables.msgpack").exists()
        assert "sha256" in meta["files"]["variables.msgpack"]

    def test_verify_bundle(self, small_checkpoint, tmp_path):
        out = export_bundle(small_checkpoint, tmp_path / "bundle2", int4=True)
        results = verify_bundle(out)
        assert results and all(results.values())

    def test_verify_detects_tamper(self, small_checkpoint, tmp_path):
        out = export_bundle(small_checkpoint, tmp_path / "bundle3", int4=False)
        (out / "variables.msgpack").write_bytes(b"tampered")
        results = verify_bundle(out)
        assert not results["variables.msgpack"]

    def test_int4_bundle_smaller(self, small_checkpoint, tmp_path):
        fp = export_bundle(small_checkpoint, tmp_path / "fp", int4=False)
        q = export_bundle(small_checkpoint, tmp_path / "q", int4=True)
        fp_meta = json.loads((fp / "export_metadata.json").read_text())
        q_meta = json.loads((q / "export_metadata.json").read_text())
        assert q_meta["param_bytes"] < 0.45 * fp_meta["param_bytes"]


class TestStability:
    def test_oracle_is_deterministic(self):
        from tilawa_tpu.eval.stability import run_stability

        report = run_stability("oracle", corpus="v1", category="short", repeats=2)
        assert report["deterministic"]
        assert report["flaky"] == 0
        assert report["samples"] > 0

    def test_classify(self):
        from tilawa_tpu.eval.stability import classify

        assert classify([True, True]) == "stable_pass"
        assert classify([False, False]) == "stable_fail"
        assert classify([True, False]) == "flaky"
