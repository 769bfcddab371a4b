"""Artifact registry (utils/artifacts.py): the no-egress equivalent of the
reference's wandb artifact flows — motion resolution by registry name
(reference scripts/train.py:48-64), checkpoint download with cache
(reference utils/os.py:87-113), policy publishing on save (reference
tasks/velocity/rl/runner.py:16-38)."""

import numpy as np
import pytest

from mjlab_tpu.utils.artifacts import (
  LocalRegistry,
  get_checkpoint_path,
  get_registry,
  resolve_motion_file,
)


def test_local_registry_publish_resolve_versions(tmp_path):
  reg = LocalRegistry(tmp_path / "reg")
  src = tmp_path / "motion.npz"
  np.savez(src, q=np.zeros(3))

  v1 = reg.publish(src, "walk")
  assert (v1 / "motion.npz").exists()
  assert reg.resolve("walk") == v1
  assert reg.resolve("walk:latest") == v1
  assert reg.resolve("walk:v1") == v1

  v2 = reg.publish(src, "walk")
  assert v2.name == "v2"
  assert reg.resolve("walk") == v2  # latest moves
  assert reg.resolve("walk:v1") == v1  # pinned version stays

  with pytest.raises(FileNotFoundError):
    reg.resolve("walk:v9")
  with pytest.raises(FileNotFoundError):
    reg.resolve("no-such-artifact")


def test_local_registry_publish_directory(tmp_path):
  reg = LocalRegistry(tmp_path / "reg")
  d = tmp_path / "bundle"
  d.mkdir()
  (d / "a.txt").write_text("x")
  v = reg.publish(d, "bundles/b1")
  assert (v / "bundle" / "a.txt").read_text() == "x"


def test_resolve_motion_file(tmp_path, monkeypatch):
  monkeypatch.setenv("MJLAB_REGISTRY_DIR", str(tmp_path / "reg"))
  monkeypatch.delenv("WANDB_API_KEY", raising=False)
  reg = LocalRegistry(tmp_path / "reg")
  src = tmp_path / "motion.npz"
  np.savez(src, q=np.zeros(3))
  reg.publish(src, "motions/walk")
  # Exact reference convention: <artifact>/motion.npz.
  assert resolve_motion_file("motions/walk").endswith("motion.npz")
  # A single differently-named npz also resolves (local publishes need no
  # rename).
  src2 = tmp_path / "run42.npz"
  np.savez(src2, q=np.ones(2))
  reg.publish(src2, "motions/other")
  assert resolve_motion_file("motions/other:latest").endswith("run42.npz")


def test_get_checkpoint_path_cache(tmp_path, monkeypatch):
  monkeypatch.setenv("MJLAB_REGISTRY_DIR", str(tmp_path / "reg"))
  monkeypatch.delenv("WANDB_API_KEY", raising=False)
  reg = LocalRegistry(tmp_path / "reg")
  run = tmp_path / "run"
  run.mkdir()
  (run / "model_10").mkdir()  # Orbax checkpoint directory
  (run / "model_10" / "blob").write_text("ckpt")
  reg.publish(run, "runs/exp1")

  log = tmp_path / "logs"
  p, was_cached = get_checkpoint_path(log, "runs/exp1")
  assert p.name == "model_10" and not was_cached
  assert (p / "blob").read_text() == "ckpt"
  p2, was_cached2 = get_checkpoint_path(log, "runs/exp1")
  assert was_cached2 and p2.name == "model_10"


def test_get_registry_defaults_to_local(monkeypatch):
  monkeypatch.delenv("WANDB_API_KEY", raising=False)
  assert isinstance(get_registry(), LocalRegistry)
