"""Declarative MjSpec editors (host-side model surgery).

Mirrors the reference's utils/spec_config.py:50-429 editor surface —
Texture/Material/Collision/Light/Camera/ActuatorSet configs that are applied
to an MjSpec before compilation. The PD actuator encoding follows MuJoCo's
position-actuator convention: gainprm[0]=kp, biasprm[1]=-kp, biasprm[2]=-kd
(reference spec_config.py:402-414).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Literal

import mujoco

from mjlab_tpu.core.strings import filter_exp, resolve_field

_TEXTURE_TYPE = {
  "2d": mujoco.mjtTexture.mjTEXTURE_2D,
  "cube": mujoco.mjtTexture.mjTEXTURE_CUBE,
  "skybox": mujoco.mjtTexture.mjTEXTURE_SKYBOX,
}
_BUILTIN = {
  "checker": mujoco.mjtBuiltin.mjBUILTIN_CHECKER,
  "gradient": mujoco.mjtBuiltin.mjBUILTIN_GRADIENT,
  "flat": mujoco.mjtBuiltin.mjBUILTIN_FLAT,
  "none": mujoco.mjtBuiltin.mjBUILTIN_NONE,
}
_MARK = {
  "edge": mujoco.mjtMark.mjMARK_EDGE,
  "cross": mujoco.mjtMark.mjMARK_CROSS,
  "random": mujoco.mjtMark.mjMARK_RANDOM,
  "none": mujoco.mjtMark.mjMARK_NONE,
}
_LIGHT_TYPE = {
  "directional": mujoco.mjtLightType.mjLIGHT_DIRECTIONAL,
  "spot": mujoco.mjtLightType.mjLIGHT_SPOT,
}
_CAMLIGHT_MODE = {
  "fixed": mujoco.mjtCamLight.mjCAMLIGHT_FIXED,
  "track": mujoco.mjtCamLight.mjCAMLIGHT_TRACK,
  "trackcom": mujoco.mjtCamLight.mjCAMLIGHT_TRACKCOM,
  "targetbody": mujoco.mjtCamLight.mjCAMLIGHT_TARGETBODY,
  "targetbodycom": mujoco.mjtCamLight.mjCAMLIGHT_TARGETBODYCOM,
}


def disable_collision(geom: mujoco.MjsGeom) -> None:
  geom.contype = 0
  geom.conaffinity = 0


def is_joint_limited(joint: mujoco.MjsJoint) -> bool:
  if joint.limited == mujoco.mjtLimited.mjLIMITED_TRUE:
    return True
  if joint.limited == mujoco.mjtLimited.mjLIMITED_AUTO:
    return bool(joint.range[0] < joint.range[1])
  return False


@dataclass
class SpecCfg(ABC):
  """Base class for declarative MjSpec edits."""

  @abstractmethod
  def edit_spec(self, spec: mujoco.MjSpec) -> None: ...

  def validate(self) -> None:  # noqa: B027
    pass


@dataclass
class TextureCfg(SpecCfg):
  name: str
  type: Literal["2d", "cube", "skybox"]
  builtin: Literal["checker", "gradient", "flat", "none"]
  rgb1: tuple[float, float, float]
  rgb2: tuple[float, float, float]
  width: int
  height: int
  mark: Literal["edge", "cross", "random", "none"] = "none"
  markrgb: tuple[float, float, float] = (0.0, 0.0, 0.0)

  def validate(self) -> None:
    if self.width <= 0 or self.height <= 0:
      raise ValueError("Texture width and height must be positive.")

  def edit_spec(self, spec: mujoco.MjSpec) -> None:
    self.validate()
    spec.add_texture(
      name=self.name,
      type=_TEXTURE_TYPE[self.type],
      builtin=_BUILTIN[self.builtin],
      mark=_MARK[self.mark],
      rgb1=self.rgb1,
      rgb2=self.rgb2,
      markrgb=self.markrgb,
      width=self.width,
      height=self.height,
    )


@dataclass
class MaterialCfg(SpecCfg):
  name: str
  texuniform: bool
  texrepeat: tuple[int, int]
  reflectance: float = 0.0
  texture: str | None = None

  def validate(self) -> None:
    if self.texrepeat[0] <= 0 or self.texrepeat[1] <= 0:
      raise ValueError("Material texrepeat values must be positive.")

  def edit_spec(self, spec: mujoco.MjSpec) -> None:
    self.validate()
    mat = spec.add_material(
      name=self.name, texuniform=self.texuniform, texrepeat=self.texrepeat
    )
    mat.reflectance = self.reflectance
    if self.texture is not None:
      mat.textures[mujoco.mjtTextureRole.mjTEXROLE_RGB.value] = self.texture


@dataclass
class CollisionCfg(SpecCfg):
  """Modify collision properties of regex-matched geoms; optionally disable
  collision on everything else (reference spec_config.py CollisionCfg)."""

  geom_names_expr: tuple[str, ...]
  contype: int | dict[str, int] = 1
  conaffinity: int | dict[str, int] = 1
  condim: int | dict[str, int] = 3
  priority: int | dict[str, int] = 0
  friction: tuple[float, ...] | dict[str, tuple[float, ...]] | None = None
  solref: tuple[float, ...] | dict[str, tuple[float, ...]] | None = None
  solimp: tuple[float, ...] | dict[str, tuple[float, ...]] | None = None
  disable_other_geoms: bool = True

  def validate(self) -> None:
    valid_condim = {1, 3, 4, 6}
    condims = (
      self.condim.values() if isinstance(self.condim, dict) else [self.condim]
    )
    for c in condims:
      if c not in valid_condim:
        raise ValueError(f"condim must be one of {valid_condim}, got {c}")
    for fname in ("contype", "conaffinity", "priority"):
      v = getattr(self, fname)
      vals = v.values() if isinstance(v, dict) else [v]
      for x in vals:
        if x < 0:
          raise ValueError(f"{fname} must be non-negative, got {x}")

  def edit_spec(self, spec: mujoco.MjSpec) -> None:
    self.validate()
    all_names = tuple(g.name for g in spec.geoms)
    subset = filter_exp(self.geom_names_expr, all_names)
    fields = {
      "condim": resolve_field(self.condim, subset, 3),
      "contype": resolve_field(self.contype, subset, 1),
      "conaffinity": resolve_field(self.conaffinity, subset, 1),
      "priority": resolve_field(self.priority, subset, 0),
      "friction": resolve_field(self.friction, subset, None),
      "solref": resolve_field(self.solref, subset, None),
      "solimp": resolve_field(self.solimp, subset, None),
    }
    for i, name in enumerate(subset):
      geom = spec.geom(name)
      geom.condim = fields["condim"][i]
      geom.contype = fields["contype"][i]
      geom.conaffinity = fields["conaffinity"][i]
      geom.priority = fields["priority"][i]
      for arr_name in ("friction", "solref", "solimp"):
        vals = fields[arr_name][i]
        if vals is not None:
          target = getattr(geom, arr_name)
          for k, v in enumerate(vals):
            target[k] = v
    if self.disable_other_geoms:
      for name in set(all_names).difference(subset):
        disable_collision(spec.geom(name))


@dataclass
class LightCfg(SpecCfg):
  name: str | None = None
  body: str = "world"
  mode: str = "fixed"
  target: str | None = None
  type: Literal["spot", "directional"] = "spot"
  castshadow: bool = True
  pos: tuple[float, float, float] = (0, 0, 0)
  dir: tuple[float, float, float] = (0, 0, -1)
  cutoff: float = 45
  exponent: float = 10

  def edit_spec(self, spec: mujoco.MjSpec) -> None:
    body = spec.worldbody if self.body == "world" else spec.body(self.body)
    light = body.add_light(
      mode=_CAMLIGHT_MODE[self.mode],
      type=_LIGHT_TYPE[self.type],
      castshadow=self.castshadow,
      pos=self.pos,
      dir=self.dir,
      cutoff=self.cutoff,
      exponent=self.exponent,
    )
    if self.name is not None:
      light.name = self.name
    if self.target is not None:
      light.targetbody = self.target


@dataclass
class CameraCfg(SpecCfg):
  name: str
  body: str = "world"
  mode: str = "fixed"
  target: str | None = None
  fovy: float = 45
  pos: tuple[float, float, float] = (0, 0, 0)
  quat: tuple[float, float, float, float] = (1, 0, 0, 0)

  def edit_spec(self, spec: mujoco.MjSpec) -> None:
    body = spec.worldbody if self.body == "world" else spec.body(self.body)
    camera = body.add_camera(
      mode=_CAMLIGHT_MODE[self.mode], fovy=self.fovy, pos=self.pos, quat=self.quat
    )
    if self.name is not None:
      camera.name = self.name
    if self.target is not None:
      camera.targetbody = self.target


@dataclass
class ActuatorCfg:
  """PD position actuator parameters for regex-matched joints."""

  joint_names_expr: tuple[str, ...]
  effort_limit: float
  stiffness: float
  damping: float
  frictionloss: float = 0.0
  armature: float = 0.0


@dataclass
class ActuatorSetCfg(SpecCfg):
  """Apply ActuatorCfgs to joints; last matching config wins; actuators are
  created in spec joint order (deterministic ctrl layout)."""

  cfgs: tuple[ActuatorCfg, ...]

  def validate(self) -> None:
    for cfg in self.cfgs:
      if cfg.effort_limit <= 0:
        raise ValueError(f"effort_limit must be positive, got {cfg.effort_limit}")
      for fname in ("stiffness", "damping", "frictionloss", "armature"):
        if getattr(cfg, fname) < 0:
          raise ValueError(f"{fname} must be non-negative")

  def edit_spec(self, spec: mujoco.MjSpec) -> None:
    self.validate()
    joints = [
      j for j in spec.joints if j.type != mujoco.mjtJoint.mjJNT_FREE
    ]
    joint_names = tuple(j.name for j in joints)

    matched: dict[str, ActuatorCfg] = {}
    for cfg in self.cfgs:
      for name in filter_exp(cfg.joint_names_expr, joint_names):
        matched[name] = cfg  # last match wins
    if self.cfgs and not matched:
      raise ValueError(
        f"No joints matched actuator patterns. Available: {joint_names}"
      )

    for joint_name in joint_names:  # spec order
      if joint_name not in matched:
        continue
      cfg = matched[joint_name]
      joint = spec.joint(joint_name)
      if not is_joint_limited(joint):
        raise ValueError(f"Joint {joint_name} must be limited for position control")
      joint.armature = cfg.armature
      joint.frictionloss = cfg.frictionloss
      act = spec.add_actuator(
        name=joint_name,
        target=joint_name,
        trntype=mujoco.mjtTrn.mjTRN_JOINT,
        gaintype=mujoco.mjtGain.mjGAIN_FIXED,
        biastype=mujoco.mjtBias.mjBIAS_AFFINE,
        inheritrange=1.0,
        forcerange=(-cfg.effort_limit, cfg.effort_limit),
      )
      act.gainprm[0] = cfg.stiffness
      act.biasprm[1] = -cfg.stiffness
      act.biasprm[2] = -cfg.damping
