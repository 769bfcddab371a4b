"""Checkpoint resolution + multihost helper tests (reference utils/os.py
regex resolution; distributed bootstrap is net-new)."""

from pathlib import Path

from mjlab_tpu.distributed import (
  global_env_offset,
  initialize_multihost,
  is_primary_host,
  process_count,
  process_index,
)
from mjlab_tpu.utils.os import resolve_checkpoint, resolve_latest_checkpoint


def _touch(p: Path):
  p.parent.mkdir(parents=True, exist_ok=True)
  p.write_text("")


class TestResolveCheckpoint:
  def test_pkl_files_newest_wins(self, tmp_path):
    _touch(tmp_path / "model_10.pkl")
    _touch(tmp_path / "model_2.pkl")
    out = resolve_latest_checkpoint(tmp_path)
    assert out == str(tmp_path / "model_10")

  def test_orbax_dirs(self, tmp_path):
    (tmp_path / "model_5").mkdir(parents=True)
    (tmp_path / "model_30").mkdir()
    out = resolve_latest_checkpoint(tmp_path)
    assert out == str(tmp_path / "model_30")

  def test_policy_artifact_does_not_shadow(self, tmp_path):
    """model_4_policy.pt must not be picked up as checkpoint model_4."""
    (tmp_path / "model_4").mkdir(parents=True)
    _touch(tmp_path / "model_4_policy.pt")
    out = resolve_latest_checkpoint(tmp_path)
    assert out == str(tmp_path / "model_4")

  def test_nested_runs_newest_run_wins(self, tmp_path):
    _touch(tmp_path / "run_2024-01-01" / "model_3.pkl")
    _touch(tmp_path / "run_2024-06-01" / "model_1.pkl")
    out = resolve_latest_checkpoint(tmp_path)
    assert out == str(tmp_path / "run_2024-06-01" / "model_1")

  def test_run_regex_filter(self, tmp_path):
    _touch(tmp_path / "good_run" / "model_1.pkl")
    _touch(tmp_path / "zz_bad" / "model_9.pkl")
    out = resolve_checkpoint(tmp_path, run_regex="good_.*")
    assert out == str(tmp_path / "good_run" / "model_1")

  def test_missing(self, tmp_path):
    assert resolve_latest_checkpoint(tmp_path / "nope") is None
    assert resolve_latest_checkpoint(tmp_path) is None


class TestMultihost:
  def test_single_process_defaults(self):
    # No coordinator configured → no-op, single-process semantics.
    assert initialize_multihost() is False
    assert process_index() == 0
    assert process_count() == 1
    assert is_primary_host()
    assert global_env_offset(1024) == 0
