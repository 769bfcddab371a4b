"""Pre-warm the persistent XLA cache for every configuration bench.py's
driver sweep touches (VERDICT r4 item 1d): cold compiles over the tunneled
TPU take tens of minutes per program, so the driver's deadline-guarded
bench only lands flagship numbers when every program is a cache hit.

Runs each bench child sequentially with NO deadline, in the same priority
order as the sweep. Safe to interrupt; progress is the cache itself.
Re-run after ANY change to traced code (physics, env step, runner).

Usage: python tools/warm_bench_cache.py [logfile]
"""

import json
import pathlib
import subprocess
import sys
import time

_REPO = pathlib.Path(__file__).resolve().parents[1]
_TASK = "Mjlab-Velocity-Flat-Unitree-G1"
_TRACK = "Mjlab-Tracking-Flat-Unitree-G1"

SPECS = [
  {"kind": "probe"},
  {"kind": "eval_small", "num_envs": 256, "steps": 20, "warmup": 3,
   "reason": "warm"},
  {"kind": "eval", "task": _TASK, "num_envs": 4096, "steps": 50, "warmup": 5},
  {"kind": "train", "task": _TASK, "num_envs": 4096, "iters": 5},
  {"kind": "eval", "task": _TRACK, "num_envs": 4096, "steps": 50,
   "warmup": 5},
  {"kind": "train", "task": _TRACK, "num_envs": 4096, "iters": 5},
  {"kind": "train", "task": _TASK, "num_envs": 1024, "iters": 5},
  {"kind": "train", "task": _TASK, "num_envs": 16384, "iters": 5},
  # Deadline-miss fallback config (bench.py healthy-path rescue row).
  {"kind": "eval", "task": _TASK, "num_envs": 1024, "steps": 10, "warmup": 2},
]


def main() -> None:
  log = open(sys.argv[1], "a") if len(sys.argv) > 1 else sys.stderr
  for spec in SPECS:
    t0 = time.perf_counter()
    print(f"=== warming {json.dumps(spec)}", file=log, flush=True)
    r = subprocess.run(
      [sys.executable, str(_REPO / "bench.py"), "--child", json.dumps(spec)],
      stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
      cwd=_REPO,
    )
    dt = time.perf_counter() - t0
    tail = "\n".join(r.stdout.splitlines()[-4:])
    print(f"=== rc={r.returncode} wall={dt:.0f}s\n{tail}", file=log,
          flush=True)


if __name__ == "__main__":
  main()
