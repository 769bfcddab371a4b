"""Runtime backend identification.

The tunneled single-chip TPU relay used for development ("axon" PJRT
plugin) executes certain program shapes pathologically slowly — scan-over-
env programs, donated large-state calls, any D2H on the hot path (measured
in docs/PERF_NOTES.md). Code that must pick an execution strategy (fused
lax.scan vs host-loop rollout, rl/runner.py) probes the REAL backend here
instead of trusting the JAX_PLATFORMS env var: the plugin reports
platform="tpu" but embeds its name in platform_version, and the env var is
frequently unset (round-3 bench regression: the driver ran without it and
the auto-detect picked the fused path — 2.1k instead of 1.9M env-steps/s).
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=1)
def is_relay_backend() -> bool:
  """True when JAX is executing through the tunneled 'axon' TPU relay.

  Probes the initialized PJRT client's platform_version (e.g.
  "PJRT C API\naxon 0.1.0; SerializedExecutable v9; ..."), which names the
  plugin regardless of how the backend was selected. Falls back to the
  JAX_PLATFORMS env var if no backend can be initialized.
  """
  import os

  try:
    import jax.extend as jex

    version = jex.backend.get_backend().platform_version
  except Exception:
    return "axon" in os.environ.get("JAX_PLATFORMS", "")
  return "axon" in version.lower()
