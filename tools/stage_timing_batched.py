"""Dev tool: per-stage run timing of the batched (vmapped) physics step.

Runs on whatever backend JAX picks (TPU via axon, or CPU). Configure with
ROBOT=go1|g1, B=<batch>, DTYPE=float32|float64.
"""

import functools
import importlib
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_mjlab")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu import physics
from mjlab_tpu.physics import collision as C
from mjlab_tpu.physics import constraint as CN
from mjlab_tpu.physics import kinematics as K
from mjlab_tpu.physics import smooth as S
from mjlab_tpu.physics import solver as SV

F = importlib.import_module("mjlab_tpu.physics.forward")


def build(robot: str):
  base = f"/root/repo/mjlab_tpu/asset_zoo/robots/unitree_{robot}/xmls/{robot}.xml"
  spec = mujoco.MjSpec.from_file(base)
  parent = mujoco.MjSpec()
  parent.worldbody.add_geom(
    name="floor", type=mujoco.mjtGeom.mjGEOM_PLANE, size=[10, 10, 0.1]
  )
  frame = parent.worldbody.add_frame()
  frame.attach_body(spec.worldbody.first_body(), f"{robot}/", "")
  return parent.compile()


def main():
  robot = os.environ.get("ROBOT", "go1")
  B = int(os.environ.get("B", "1024"))
  dtype = jnp.float64 if os.environ.get("DTYPE") == "float64" else jnp.float32
  reps = int(os.environ.get("REPS", "20"))

  mjm = build(robot)
  tp, model = physics.put_model(mjm, dtype=dtype)
  print(f"{robot} B={B} pairs={len(tp.pairs)} ncon={tp.ncon_max} nefc={tp.nefc} "
        f"backend={jax.devices()[0].platform}", flush=True)

  d1 = physics.make_data(tp, model)
  qpos0 = np.array(mjm.qpos0)
  qpos0[2] = 0.45 if robot == "go1" else 0.8
  d1 = d1.replace(qpos=jnp.asarray(qpos0, dtype=dtype))
  d = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d1)

  stages = [
    ("kin", lambda m_, d_: K.kinematics(tp, m_, d_)),
    ("com_pos", lambda m_, d_: S.com_pos(tp, m_, d_)),
    ("crb", lambda m_, d_: S.crb(tp, m_, d_)),
    ("factor", lambda m_, d_: S.factor_m(tp, m_, d_)),
    ("coll", lambda m_, d_: C.collision(tp, m_, d_)),
    ("constr", lambda m_, d_: CN.make_constraint(tp, m_, d_)),
    ("com_vel", lambda m_, d_: S.com_vel(tp, m_, d_)),
    ("rne", lambda m_, d_: S.rne(tp, m_, d_)),
    ("passive", lambda m_, d_: S.passive(tp, m_, d_)),
    ("act", lambda m_, d_: S.fwd_actuation(tp, m_, d_)),
    ("accel", lambda m_, d_: S.fwd_acceleration(tp, m_, d_)),
    ("solve", lambda m_, d_: SV.solve(tp, m_, d_)),
    ("integrate", lambda m_, d_: F.integrate(tp, m_, d_)),
  ]
  total = 0.0
  for name, fn in stages:
    jfn = jax.jit(jax.vmap(fn, in_axes=(None, 0)))
    t0 = time.time()
    d2 = jfn(model, d)
    jax.block_until_ready(jax.tree_util.tree_leaves(d2)[0])
    t1 = time.time()
    for _ in range(reps):
      d2 = jfn(model, d)
    jax.block_until_ready(jax.tree_util.tree_leaves(d2)[0])
    t2 = time.time()
    per = (t2 - t1) / reps
    total += per
    print(f"{name:10s} compile {t1 - t0:6.1f}s  run {per * 1e3:8.2f} ms", flush=True)
    d = d2

  print(f"sum of stages: {total * 1e3:.2f} ms", flush=True)

  step = jax.jit(jax.vmap(functools.partial(physics.step, tp), in_axes=(None, 0)))
  t0 = time.time()
  d2 = step(model, d)
  jax.block_until_ready(d2.qpos)
  t1 = time.time()
  for _ in range(reps):
    d2 = step(model, d2)
  jax.block_until_ready(d2.qpos)
  t2 = time.time()
  print(f"full step: compile {t1 - t0:.1f}s run {(t2 - t1) / reps * 1e3:.2f} ms "
        f"→ {B * reps / (t2 - t1):,.0f} physics-steps/s", flush=True)


if __name__ == "__main__":
  main()
