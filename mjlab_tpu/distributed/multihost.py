"""Multi-host process bootstrap (net-new vs the single-GPU reference;
SURVEY §2.10 / §5: DCN is crossed only here and at checkpoint I/O).

`initialize_multihost()` wires `jax.distributed.initialize` from standard
cluster env vars (it no-ops for single-process runs so every entry point can
call it unconditionally), and the helpers below answer the usual "who logs /
who saves" questions.
"""

from __future__ import annotations

import os

import jax


def initialize_multihost(
  coordinator_address: str | None = None,
  num_processes: int | None = None,
  process_id: int | None = None,
) -> bool:
  """Initialize jax.distributed when running as part of a multi-process job.

  Returns True if distributed mode was initialized. Resolution order:
  explicit args → JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID
  env vars → TPU pod auto-detection (args all None on a pod slice) → no-op.
  """
  coordinator_address = coordinator_address or os.environ.get(
    "JAX_COORDINATOR_ADDRESS"
  )
  if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
    num_processes = int(os.environ["JAX_NUM_PROCESSES"])
  if process_id is None and "JAX_PROCESS_ID" in os.environ:
    process_id = int(os.environ["JAX_PROCESS_ID"])

  explicit = coordinator_address is not None
  auto_pod = (
    not explicit
    and os.environ.get("TPU_WORKER_HOSTNAMES") is not None
  )
  if not explicit and not auto_pod:
    return False
  try:
    if explicit:
      jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
      )
    else:
      jax.distributed.initialize()  # pod auto-detection
    return True
  except (RuntimeError, ValueError) as e:
    # Already initialized (idempotent callers) is fine. Failed AUTO
    # detection (e.g. a single-host tunnel that leaks pod env vars)
    # degrades to single-process; an explicit config that fails must raise.
    if "already" in str(e).lower():
      return True
    if not explicit:
      return False
    raise


def process_index() -> int:
  return jax.process_index()


def process_count() -> int:
  return jax.process_count()


def is_primary_host() -> bool:
  """True on the process that should own logging and checkpoint writes."""
  return jax.process_index() == 0


def global_env_offset(num_envs_per_host: int) -> int:
  """First global env id owned by this host (deterministic per-env RNG via
  jax.random.fold_in(key, global_env_id); SURVEY §7 hard part 6)."""
  return jax.process_index() * num_envs_per_host
