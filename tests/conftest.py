"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding paths can be
exercised without TPU hardware (mirrors the reference's FORCE_CPU=1 CPU-backend
strategy, reference tests/conftest.py:16-24). Physics parity tests enable f64 to
compare against the MuJoCo C reference at tight tolerance.

Note: the ambient environment may point JAX at a TPU tunnel
(JAX_PLATFORMS=axon) and pytest plugins (jaxtyping) import jax before this
file runs, so we must use jax.config.update — it works any time before the
backend is first used.
"""

import os

# MJLAB_TEST_PLATFORM=tpu keeps the ambient accelerator backend (used to
# record/verify the TPU golden rollouts, tests/test_golden_rollout.py);
# default is the CPU + 8-virtual-device + f64 configuration below.
_platform = os.environ.get("MJLAB_TEST_PLATFORM", "cpu")

if _platform == "cpu":
  os.environ["JAX_PLATFORMS"] = "cpu"
# Headless rendering: mujoco binds its GL backend at first context creation
# and the env var must be set before that — EGL works in this image.
os.environ.setdefault("MUJOCO_GL", "egl")
if _platform == "cpu":
  flags = os.environ.get("XLA_FLAGS", "")
  if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if _platform == "cpu":
  jax.config.update("jax_platforms", "cpu")
  jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA compiles of robot-scale models take
# minutes on small hosts; cache them across test runs (and across CI runs
# via actions/cache — see .github/workflows/ci.yml).
_cache_dir = os.environ.get(
  "MJLAB_COMPILE_CACHE", os.path.expanduser("~/.cache/jax_mjlab")
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
