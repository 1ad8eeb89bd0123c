"""Checkpoint save/load for model variables.

The reference checkpoints through Lightning onto Modal volumes and
distributes .nemo archives (reference: scripts/train_fastconformer_phoneme_
modal.py:1334+, SURVEY.md §5.4). Here: flax msgpack serialization plus a
JSON config sidecar; orbax is used by the training loop for async
checkpointing when available.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path

import jax.numpy as jnp
from flax import serialization

from tilawa_tpu.models.fastconformer import FastConformerConfig, FastConformerCTC

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
CHECKPOINT_DIR = Path(os.getenv("TILAWA_CHECKPOINT_DIR", str(_REPO_ROOT / "checkpoints")))

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}


def save_variables(path: str | Path, config: FastConformerConfig, variables) -> Path:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    cfg = dataclasses.asdict(config)
    cfg["dtype"] = jnp.dtype(config.dtype).name
    (path / "config.json").write_text(json.dumps(cfg, indent=2))
    (path / "variables.msgpack").write_bytes(serialization.to_bytes(variables))
    return path


def load_config(path: str | Path) -> FastConformerConfig:
    cfg = json.loads((Path(path) / "config.json").read_text())
    cfg["dtype"] = _DTYPES[cfg.get("dtype", "float32")]
    return FastConformerConfig(**cfg)


def load_variables(path: str | Path):
    path = Path(path)
    config = load_config(path)

    import jax

    model = FastConformerCTC(config)
    with jax.default_device(jax.local_devices(backend="cpu")[0] if any(
        d.platform == "cpu" for d in jax.local_devices()
    ) else jax.local_devices()[0]):
        template = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 32000), jnp.float32),
                jnp.array([32000], jnp.int32),
            )
        )
    variables = serialization.from_bytes(
        template, (path / "variables.msgpack").read_bytes()
    )
    return config, variables


EXPORTS_DIR = Path(os.getenv("TILAWA_EXPORTS_DIR", str(_REPO_ROOT / "exports")))


def latest_checkpoint(root: str | Path | None = None) -> Path | None:
    """Newest training checkpoint under `root` (resume-training semantics);
    falls back to the shipped export bundle when no training checkpoints
    exist."""
    root = Path(root) if root else CHECKPOINT_DIR
    candidates = (
        [p.parent for p in root.rglob("variables.msgpack")]
        if root.exists() else []
    )
    if candidates:
        return max(candidates, key=lambda p: p.stat().st_mtime)
    if root == CHECKPOINT_DIR and EXPORTS_DIR.exists():
        bundles = [p.parent for p in EXPORTS_DIR.rglob("variables.msgpack")]
        if bundles:
            return max(bundles, key=lambda p: p.stat().st_mtime)
    return None


def shipped_checkpoint() -> Path | None:
    """Weights for serving/eval/bench: `TILAWA_CHECKPOINT` env override,
    else the newest *shipped* export bundle, else the newest training
    checkpoint.

    Serving paths must NOT pick up in-flight training checkpoints
    implicitly — a regressed fine-tune under checkpoints/ once silently
    became every eval's default model. Training resume keeps using
    latest_checkpoint()."""
    env = os.getenv("TILAWA_CHECKPOINT")
    if env:
        return Path(env)
    if EXPORTS_DIR.exists():
        # The CHAMPION bundle is the shipped default, explicitly: the
        # newest-mtime rule silently flipped serving/bench to whatever
        # was exported last (measured: exports/heldout-int4 — the
        # 5%-on-v1 honesty artifact — became every run's default the
        # moment it was written).
        champion = EXPORTS_DIR / "champion-int4"
        if (champion / "variables.msgpack").exists():
            return champion
        bundles = [p.parent for p in EXPORTS_DIR.rglob("variables.msgpack")]
        if bundles:
            return max(bundles, key=lambda p: p.stat().st_mtime)
    return latest_checkpoint()
