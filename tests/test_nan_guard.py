"""NaN-guard dump lifecycle tests (reference tests/test_nan_guard.py)."""

import types

import mujoco
import numpy as np

from mjlab_tpu.utils.nan_guard import NanGuard, NanGuardCfg


def _fake_env(num_envs=4):
  model = mujoco.MjSpec.from_string(
    """
    <mujoco><worldbody><body name="b" pos="0 0 1">
      <freejoint/><geom type="sphere" size="0.1"/>
    </body></worldbody></mujoco>"""
  ).compile()
  nq, nv = model.nq, model.nv
  data = types.SimpleNamespace(
    qpos=np.zeros((num_envs, nq)),
    qvel=np.zeros((num_envs, nv)),
    qacc=np.zeros((num_envs, nv)),
    ctrl=np.zeros((num_envs, 0)),
    time=np.zeros((num_envs,)),
  )
  env = types.SimpleNamespace(
    state=types.SimpleNamespace(data=data),
    sim=types.SimpleNamespace(mj_model=model),
  )
  return env


def test_disabled_guard_never_fires(tmp_path):
  env = _fake_env()
  guard = NanGuard(NanGuardCfg(enabled=False, output_dir=str(tmp_path)), env)
  env.state.data.qpos[0, 0] = np.nan
  assert guard.watch() is False
  assert not any(tmp_path.iterdir())


def test_dump_on_nan(tmp_path):
  env = _fake_env(num_envs=4)
  cfg = NanGuardCfg(
    enabled=True, buffer_size=5, max_envs_to_dump=2, output_dir=str(tmp_path)
  )
  guard = NanGuard(cfg, env)

  # Healthy steps fill the ring.
  for i in range(7):
    env.state.data.qpos[:, 0] = float(i)
    assert guard.watch() is False

  # Poison envs 1 and 3.
  env.state.data.qpos[1, 0] = np.nan
  env.state.data.qvel[3, 0] = np.inf
  assert guard.watch() is True

  dump_dirs = [p for p in tmp_path.iterdir() if p.is_dir() and p.name != "latest"]
  assert len(dump_dirs) == 1
  run_dir = dump_dirs[0]
  # max_envs_to_dump=2 → both poisoned envs dumped, plus the model.
  npz_files = sorted(p.name for p in run_dir.glob("env_*.npz"))
  assert npz_files == ["env_1.npz", "env_3.npz"]
  assert (run_dir / "model.mjb").exists()

  # Ring semantics: buffer_size snapshots, newest last, ending in the NaN.
  arrays = np.load(run_dir / "env_1.npz")
  assert arrays["qpos"].shape[0] == 5
  assert np.isnan(arrays["qpos"][-1, 0])
  assert arrays["qpos"][-2, 0] == 6.0

  # latest symlink points at the run dir.
  latest = tmp_path / "latest"
  assert latest.is_symlink()
  assert latest.resolve() == run_dir.resolve()

  # Guard fires only once.
  assert guard.watch() is False


def test_model_reloadable_from_dump(tmp_path):
  env = _fake_env()
  guard = NanGuard(NanGuardCfg(enabled=True, output_dir=str(tmp_path)), env)
  env.state.data.qpos[0, 0] = np.nan
  assert guard.watch() is True
  run_dir = next(p for p in tmp_path.iterdir() if p.is_dir() and p.name != "latest")
  reloaded = mujoco.MjModel.from_binary_path(str(run_dir / "model.mjb"))
  assert reloaded.nq == env.sim.mj_model.nq
