"""Dev tool: per-stage compile/run timing + parity on G1 (CPU, f64)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import time

import jax

jax.config.update("jax_enable_x64", True)
import functools

import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu import physics
from mjlab_tpu.physics import collision as C
from mjlab_tpu.physics import constraint as CN
import importlib

F = importlib.import_module("mjlab_tpu.physics.forward")
from mjlab_tpu.physics import kinematics as K
from mjlab_tpu.physics import smooth as S
from mjlab_tpu.physics import solver as SV


def build():
  spec = mujoco.MjSpec.from_file(
    "/root/reference/src/mjlab/asset_zoo/robots/unitree_g1/xmls/g1.xml"
  )
  parent = mujoco.MjSpec()
  parent.worldbody.add_geom(
    name="floor", type=mujoco.mjtGeom.mjGEOM_PLANE, size=[10, 10, 0.1]
  )
  frame = parent.worldbody.add_frame()
  frame.attach_body(spec.worldbody.first_body(), "g1/", "")
  mjm = parent.compile()
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = mjm.qpos0
  mjd.qpos[2] = 0.8
  return mjm, mjd


def main():
  mjm, mjd = build()
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  print("pairs", len(tp.pairs), "ncon", tp.ncon_max, "nefc", tp.nefc, flush=True)
  d = physics.make_data(tp, model)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()))

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
  for name, fn in stages:
    jfn = jax.jit(fn)
    t0 = time.time()
    d2 = jfn(model, d)
    jax.block_until_ready(jax.tree_util.tree_leaves(d2)[0])
    t1 = time.time()
    d3 = jfn(model, d)
    jax.block_until_ready(jax.tree_util.tree_leaves(d3)[0])
    t2 = time.time()
    print(f"{name}: compile+run {t1 - t0:.2f}s run {t2 - t1:.4f}s", flush=True)
    d = d2

  # Parity after one full forward.
  mujoco.mj_forward(mjm, mjd)
  print("qacc err", np.abs(np.asarray(d.qacc) - mjd.qacc).max(),
        "scale", np.abs(mjd.qacc).max(), flush=True)

  # Trajectory.
  step = jax.jit(functools.partial(physics.step, tp))
  t0 = time.time()
  d = step(model, d)
  jax.block_until_ready(d.qpos)
  print("full step compile", round(time.time() - t0, 1), flush=True)
  mjd2 = mujoco.MjData(mjm)
  mjd2.qpos[:] = mjm.qpos0
  mjd2.qpos[2] = 0.8
  d = physics.make_data(tp, model)
  d = d.replace(qpos=jnp.asarray(mjd2.qpos.copy()))
  t0 = time.time()
  for _ in range(200):
    mujoco.mj_step(mjm, mjd2)
    d = step(model, d)
  jax.block_until_ready(d.qpos)
  print("200 steps walltime", round(time.time() - t0, 1), flush=True)
  print("qpos err", np.abs(np.asarray(d.qpos) - mjd2.qpos).max(),
        "qvel err", np.abs(np.asarray(d.qvel) - mjd2.qvel).max(), flush=True)
  print("height ours", float(d.qpos[2]), "mj", mjd2.qpos[2], flush=True)


if __name__ == "__main__":
  main()
