"""A/B the rough-terrain slot-saturation telemetry cost (VERDICT r4 item 6a).

The telemetry builds an (R, nc, slots) pairwise-distance tensor every
physics substep on rough terrain (physics/collision.py select). Rather
than paying two cold TPU compiles, this measures its analytic cost: lower
the full jitted env step for the rough G1 task with the telemetry on and
off (MJLAB_SATURATION_TELEMETRY trace-time gate) and diff XLA's
cost_analysis FLOP/byte estimates. Appends one line to AB_RESULTS_r5.jsonl.

Run: python tools/ab_saturation_cost.py  (spawns two subprocesses)
"""

import json
import os
import pathlib
import subprocess
import sys

_REPO = pathlib.Path(__file__).resolve().parents[1]

_CHILD = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv

cfg = tasks.load_cfg_from_registry(
  "Mjlab-Velocity-Rough-Unitree-G1", "env_cfg_entry_point")
cfg.scene.num_envs = 8
cfg.sim.dtype = "float32"
env = ManagerBasedRlEnv(cfg)
action = jnp.zeros((8, env.action_manager.total_action_dim), dtype=env.dtype)
lowered = jax.jit(env._step_impl).lower(env.state, action)
ca = lowered.cost_analysis()
ca = ca[0] if isinstance(ca, (list, tuple)) else ca
print("COST " + json.dumps({
  "telemetry": os.environ.get("MJLAB_SATURATION_TELEMETRY", "1"),
  "flops": ca.get("flops", -1.0),
  "bytes": ca.get("bytes accessed", -1.0),
}), flush=True)
"""


def _run(flag: str) -> dict:
  env = dict(os.environ)
  env["MJLAB_SATURATION_TELEMETRY"] = flag
  env["JAX_PLATFORMS"] = "cpu"
  r = subprocess.run([sys.executable, "-c", _CHILD], env=env, cwd=_REPO,
                     stdout=subprocess.PIPE, text=True, timeout=1800)
  assert r.returncode == 0
  for line in reversed(r.stdout.splitlines()):
    if line.startswith("COST "):
      return json.loads(line[5:])
  raise RuntimeError("child printed no COST line")


def main() -> None:
  on = _run("1")
  off = _run("0")
  d_flops = (on["flops"] - off["flops"]) / off["flops"]
  d_bytes = (on["bytes"] - off["bytes"]) / off["bytes"]
  row = {
    "label": "saturation_telemetry_cost",
    "task": "Mjlab-Velocity-Rough-Unitree-G1 (8 envs, full env step)",
    "on": on, "off": off,
    "flops_overhead": round(d_flops, 5),
    "bytes_overhead": round(d_bytes, 5),
    "decision": "default ON" if max(d_flops, d_bytes) < 0.02
    else "gate OFF by default (>2%)",
  }
  print(json.dumps(row, indent=1))
  with open(_REPO / "tools" / "AB_RESULTS_r5.jsonl", "a") as f:
    f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
  main()
