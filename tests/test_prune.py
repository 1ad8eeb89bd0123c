"""Depth pruning over scan-stacked checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tilawa_tpu.models.fastconformer import FastConformerConfig, FastConformerCTC
from tilawa_tpu.train.prune import layer_indices, prune_layers

pytestmark = pytest.mark.slow



class TestLayerIndices:
    def test_first_n(self):
        assert layer_indices(17, 3, "first_n") == [0, 1, 2]

    def test_evenly_spaced_endpoints(self):
        idx = layer_indices(17, 6, "evenly_spaced")
        assert idx[0] == 0 and idx[-1] == 16 and len(idx) == 6

    def test_keep_all(self):
        assert layer_indices(4, 9) == [0, 1, 2, 3]

    def test_bad_mode(self):
        with pytest.raises(ValueError):
            layer_indices(4, 2, "bogus")


class TestPrune:
    def test_pruned_model_runs(self):
        cfg = FastConformerConfig.small(num_layers=4, dropout=0.0)
        model = FastConformerCTC(cfg)
        audio = jnp.zeros((1, 16000), jnp.float32)
        lengths = jnp.array([16000], jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), audio, lengths)

        new_cfg, new_vars = prune_layers(cfg, variables, keep=2, mode="first_n")
        assert new_cfg.num_layers == 2
        blocks = new_vars["params"]["blocks"]["block"]
        assert blocks["ff1"]["lin1"]["kernel"].shape[0] == 2

        lp, lens = FastConformerCTC(new_cfg).apply(new_vars, audio, lengths)
        assert np.isfinite(np.asarray(lp)).all()

    def test_first_n_matches_source_layers(self):
        cfg = FastConformerConfig.small(num_layers=3, dropout=0.0)
        model = FastConformerCTC(cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16000)), jnp.array([16000], jnp.int32)
        )
        _, new_vars = prune_layers(cfg, variables, keep=2, mode="first_n")
        src = np.asarray(variables["params"]["blocks"]["block"]["ff1"]["lin1"]["kernel"])
        dst = np.asarray(new_vars["params"]["blocks"]["block"]["ff1"]["lin1"]["kernel"])
        np.testing.assert_array_equal(dst, src[:2])
