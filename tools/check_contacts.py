"""Dev tool: contact parity sweep vs CPU MuJoCo (run on CPU, f64)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import functools

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu import physics


def compare(xml, qvel=None, nsteps=0, label=""):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  if qvel is not None:
    mjd.qvel[: len(qvel)] = qvel
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  step = jax.jit(functools.partial(physics.step, tp))
  fwd = jax.jit(functools.partial(physics.forward, tp))
  d = physics.make_data(tp, model)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()), qvel=jnp.asarray(mjd.qvel.copy()))
  for _ in range(nsteps):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)
  mujoco.mj_forward(mjm, mjd)
  d = fwd(model, d)
  qacc_err = np.abs(np.asarray(d.qacc) - mjd.qacc).max()
  qpos_err = np.abs(np.asarray(d.qpos) - mjd.qpos).max()
  qvel_err = np.abs(np.asarray(d.qvel) - mjd.qvel).max()
  print(
    f"{label}: nefc_mj={mjd.nefc} qpos_err={qpos_err:.2e} qvel_err={qvel_err:.2e} "
    f"qacc_err={qacc_err:.2e} qacc_scale={np.abs(mjd.qacc).max():.2f}"
  )


SPHERE = """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1" friction="0.8"/>
    <body pos="0.01 0.02 0.093"><freejoint/>
      <geom type="sphere" size="0.1" friction="0.8 0.01 0.002"/></body>
  </worldbody></mujoco>"""

CAPSULE = """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1"/>
    <body pos="0 0 0.08" euler="0 3 0"><freejoint/>
      <geom type="capsule" fromto="-0.15 0 0 0.15 0 0" size="0.05" friction="0.9 0.01 0.001"/></body>
  </worldbody></mujoco>"""

BOX = """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1"/>
    <body pos="0 0 0.1" euler="2 1 0"><freejoint/>
      <geom type="box" size="0.1 0.08 0.06"/></body>
  </worldbody></mujoco>"""

TWO = """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1"/>
    <body pos="0 0 0.1"><freejoint/><geom type="sphere" size="0.1"/></body>
    <body pos="0.05 0 0.32"><freejoint/><geom type="capsule" fromto="-0.1 0 0 0.1 0 0" size="0.05"/></body>
  </worldbody></mujoco>"""

LIMIT = """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint type="hinge" axis="0 1 0" range="-0.5 0.5" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04" contype="0" conaffinity="0"/>
    </body>
  </worldbody></mujoco>"""

if __name__ == "__main__":
  compare(SPHERE, qvel=[0.1, -0.2, -0.5, 0.3, 0.1, -0.2], label="sphere rest")
  compare(SPHERE, qvel=[0.1, -0.2, -0.5, 0.3, 0.1, -0.2], nsteps=50, label="sphere 50")
  compare(CAPSULE, qvel=[0.2, 0.1, -0.3, 0.5, -0.2, 0.1], label="capsule rest")
  compare(CAPSULE, qvel=[0.2, 0.1, -0.3, 0.5, -0.2, 0.1], nsteps=100, label="capsule 100")
  compare(BOX, qvel=[0.1, 0, -0.4, 0.2, 0.3, -0.1], label="box rest")
  compare(BOX, qvel=[0.1, 0, -0.4, 0.2, 0.3, -0.1], nsteps=100, label="box 100")
  compare(TWO, qvel=[0, 0, 0, 0, 0, 0, 0, 0, -0.5, 0, 0, 0], nsteps=150, label="stack 150")
  compare(LIMIT, qvel=[2.0], nsteps=200, label="jnt limit 200")
