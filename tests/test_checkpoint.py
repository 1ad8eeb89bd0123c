"""Checkpoint resolution: serving must prefer shipped exports over
in-flight training checkpoints (a regressed fine-tune under checkpoints/
once silently became every eval's default model)."""

import time

from tilawa_tpu.train import checkpoint as ckpt_mod


def _bundle(dirpath):
    dirpath.mkdir(parents=True, exist_ok=True)
    (dirpath / "variables.msgpack").write_bytes(b"x")
    (dirpath / "config.json").write_text("{}")
    return dirpath


def test_shipped_prefers_exports_over_training(tmp_path, monkeypatch):
    exports = tmp_path / "exports"
    ckpts = tmp_path / "checkpoints"
    bundle = _bundle(exports / "champion")
    _bundle(ckpts / "run1" / "step_000500")
    # training checkpoint is NEWER — shipped_checkpoint must still pick exports
    time.sleep(0.01)
    (ckpts / "run1" / "step_000500" / "variables.msgpack").write_bytes(b"y")
    monkeypatch.setattr(ckpt_mod, "EXPORTS_DIR", exports)
    monkeypatch.setattr(ckpt_mod, "CHECKPOINT_DIR", ckpts)
    monkeypatch.delenv("TILAWA_CHECKPOINT", raising=False)
    assert ckpt_mod.shipped_checkpoint() == bundle


def test_shipped_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("TILAWA_CHECKPOINT", str(tmp_path / "pinned"))
    assert ckpt_mod.shipped_checkpoint() == tmp_path / "pinned"


def test_shipped_falls_back_to_training(tmp_path, monkeypatch):
    ckpts = tmp_path / "checkpoints"
    step = _bundle(ckpts / "run1" / "step_001000")
    monkeypatch.setattr(ckpt_mod, "EXPORTS_DIR", tmp_path / "no_exports")
    monkeypatch.setattr(ckpt_mod, "CHECKPOINT_DIR", ckpts)
    monkeypatch.delenv("TILAWA_CHECKPOINT", raising=False)
    assert ckpt_mod.shipped_checkpoint() == step


def test_latest_checkpoint_newest_wins(tmp_path, monkeypatch):
    ckpts = tmp_path / "checkpoints"
    _bundle(ckpts / "run1" / "step_000500")
    time.sleep(0.01)
    newer = _bundle(ckpts / "run1" / "step_001000")
    monkeypatch.setattr(ckpt_mod, "CHECKPOINT_DIR", ckpts)
    assert ckpt_mod.latest_checkpoint(ckpts) == newer
