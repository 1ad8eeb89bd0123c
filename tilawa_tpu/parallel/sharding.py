"""Parameter partitioning rules + sharded apply/step builders.

Tensor-parallel layout for the FastConformer (Megatron-style pairing so
XLA inserts a single psum per block over ICI):

  * FFN: first Dense kernel [d, f·d] column-sharded over "model"; second
    Dense kernel [f·d, d] row-sharded — activation all-reduce after.
  * Attention: q/k/v kernels [d, d] column-sharded (heads split across
    "model"); output projection row-sharded.
  * Everything else (convs, norms, biases, CTC head) replicated — they are
    bandwidth-trivial next to the matmuls.

Batch ("data") sharding applies to all activations via input shardings;
the mesh is usually (n, 1) so these rules are inert on a single chip.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tilawa_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def param_spec(path: tuple[str, ...], ndim: int) -> P:
    """PartitionSpec for one parameter, keyed by its flax path.

    Kernels stacked by nn.scan over the depth axis carry a leading layer
    dim (rank 3); the model-axis position shifts right accordingly."""
    names = [p if isinstance(p, str) else getattr(p, "key", str(p)) for p in path]
    joined = "/".join(str(n) for n in names)
    if ndim < 2:
        return P()
    lead = (None,) * (ndim - 2)  # scan-stacked layer axes, replicated

    def col():  # output-dim sharded
        return P(*lead, None, MODEL_AXIS)

    def row():  # input-dim sharded
        return P(*lead, MODEL_AXIS, None)

    # FFN pair (explicitly named lin1/lin2 in FeedForward)
    if "lin1" in joined and ("ff1" in joined or "ff2" in joined):
        return col()
    if "lin2" in joined and ("ff1" in joined or "ff2" in joined):
        return row()
    # Attention projections
    if "attn" in joined:
        if any(f"/{k}/" in joined + "/" for k in ("q", "k", "v", "pos")):
            return col()
        if "/out/" in joined + "/":
            return row()
    return P()


def variables_shardings(variables, mesh: Mesh):
    """NamedSharding pytree matching `variables` (params partitioned per
    param_spec, collections like batch_stats replicated)."""

    def assign(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        if names and names[0] == "params":
            return NamedSharding(mesh, param_spec(tuple(names[1:]), leaf.ndim))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, variables)


def shard_variables(variables, mesh: Mesh):
    """Place a variables pytree onto the mesh per the partitioning rules."""
    shardings = variables_shardings(variables, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), variables, shardings
    )


def opt_state_shardings(tx, opt_state, params, mesh: Mesh):
    """Optimizer-state shardings mirroring the param layout: AdamW moments
    (mu/nu) get each parameter's own PartitionSpec, every non-param leaf
    (step counts, empty states) is replicated. Uses optax.tree_map_params
    so the mapping follows the optimizer's own notion of which state parts
    are param-shaped."""
    import optax

    pshard = variables_shardings({"params": params}, mesh)["params"]
    return optax.tree_map_params(
        tx,
        lambda _leaf, s: s,
        opt_state,
        pshard,
        transform_non_params=lambda _leaf: NamedSharding(mesh, P()),
    )


def batch_shardings(mesh: Mesh, *specs):
    return tuple(NamedSharding(mesh, s) for s in specs)


def data_batch_spec() -> P:
    return P(DATA_AXIS)
