"""Builtin sensor wrapper.

Covers the reference's BuiltinSensor (sensor/builtin_sensor.py:15-340): a
typed wrapper over MuJoCo's builtin sensor catalog. Sensors declared in robot
XML are auto-wrapped via `from_existing` (reference scene.py:171-173); new
ones can be added pre-compile via BuiltinSensorCfg. Values are produced by
the engine's sensor pass (physics/sensors.py) into Data.sensordata; this
class only binds the (adr, dim) view.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import mujoco

from mjlab_tpu.sensors.sensor import Sensor, SensorCfg

_SENSOR_TYPES: dict[str, mujoco.mjtSensor] = {
  "gyro": mujoco.mjtSensor.mjSENS_GYRO,
  "velocimeter": mujoco.mjtSensor.mjSENS_VELOCIMETER,
  "accelerometer": mujoco.mjtSensor.mjSENS_ACCELEROMETER,
  "framepos": mujoco.mjtSensor.mjSENS_FRAMEPOS,
  "framequat": mujoco.mjtSensor.mjSENS_FRAMEQUAT,
  "framelinvel": mujoco.mjtSensor.mjSENS_FRAMELINVEL,
  "frameangvel": mujoco.mjtSensor.mjSENS_FRAMEANGVEL,
  "framexaxis": mujoco.mjtSensor.mjSENS_FRAMEXAXIS,
  "frameyaxis": mujoco.mjtSensor.mjSENS_FRAMEYAXIS,
  "framezaxis": mujoco.mjtSensor.mjSENS_FRAMEZAXIS,
  "jointpos": mujoco.mjtSensor.mjSENS_JOINTPOS,
  "jointvel": mujoco.mjtSensor.mjSENS_JOINTVEL,
  "subtreecom": mujoco.mjtSensor.mjSENS_SUBTREECOM,
  "subtreelinvel": mujoco.mjtSensor.mjSENS_SUBTREELINVEL,
  "subtreeangmom": mujoco.mjtSensor.mjSENS_SUBTREEANGMOM,
  "actuatorpos": mujoco.mjtSensor.mjSENS_ACTUATORPOS,
  "actuatorvel": mujoco.mjtSensor.mjSENS_ACTUATORVEL,
  "actuatorfrc": mujoco.mjtSensor.mjSENS_ACTUATORFRC,
  "magnetometer": mujoco.mjtSensor.mjSENS_MAGNETOMETER,
  "clock": mujoco.mjtSensor.mjSENS_CLOCK,
  "tendonpos": mujoco.mjtSensor.mjSENS_TENDONPOS,
  "tendonvel": mujoco.mjtSensor.mjSENS_TENDONVEL,
  "jointlimitpos": mujoco.mjtSensor.mjSENS_JOINTLIMITPOS,
  "jointlimitvel": mujoco.mjtSensor.mjSENS_JOINTLIMITVEL,
  "jointlimitfrc": mujoco.mjtSensor.mjSENS_JOINTLIMITFRC,
  "jointactuatorfrc": mujoco.mjtSensor.mjSENS_JOINTACTFRC,
  "framelinacc": mujoco.mjtSensor.mjSENS_FRAMELINACC,
  "frameangacc": mujoco.mjtSensor.mjSENS_FRAMEANGACC,
  "e_potential": mujoco.mjtSensor.mjSENS_E_POTENTIAL,
  "e_kinetic": mujoco.mjtSensor.mjSENS_E_KINETIC,
  "force": mujoco.mjtSensor.mjSENS_FORCE,
  "torque": mujoco.mjtSensor.mjSENS_TORQUE,
  "touch": mujoco.mjtSensor.mjSENS_TOUCH,
  "rangefinder": mujoco.mjtSensor.mjSENS_RANGEFINDER,
  "tendonactuatorfrc": mujoco.mjtSensor.mjSENS_TENDONACTFRC,
}

_OBJ_TYPES: dict[str, mujoco.mjtObj] = {
  "site": mujoco.mjtObj.mjOBJ_SITE,
  "body": mujoco.mjtObj.mjOBJ_BODY,
  "xbody": mujoco.mjtObj.mjOBJ_XBODY,
  "geom": mujoco.mjtObj.mjOBJ_GEOM,
  "joint": mujoco.mjtObj.mjOBJ_JOINT,
  "actuator": mujoco.mjtObj.mjOBJ_ACTUATOR,
  "tendon": mujoco.mjtObj.mjOBJ_TENDON,
}

# Sensor kinds that require an object reference and which obj kinds they allow.
_REQUIRED_OBJ: dict[str, tuple[str, ...]] = {
  "gyro": ("site",),
  "velocimeter": ("site",),
  "accelerometer": ("site",),
  "framepos": ("site", "body", "xbody", "geom"),
  "framequat": ("site", "body", "xbody", "geom"),
  "framelinvel": ("site", "body", "xbody", "geom"),
  "frameangvel": ("site", "body", "xbody", "geom"),
  "framexaxis": ("site", "body", "xbody", "geom"),
  "frameyaxis": ("site", "body", "xbody", "geom"),
  "framezaxis": ("site", "body", "xbody", "geom"),
  "jointpos": ("joint",),
  "jointvel": ("joint",),
  "subtreecom": ("body",),
  "subtreelinvel": ("body",),
  "subtreeangmom": ("body",),
  "actuatorpos": ("actuator",),
  "actuatorvel": ("actuator",),
  "actuatorfrc": ("actuator",),
  "magnetometer": ("site",),
  "tendonpos": ("tendon",),
  "tendonvel": ("tendon",),
  "jointlimitpos": ("joint",),
  "jointlimitvel": ("joint",),
  "jointlimitfrc": ("joint",),
  "jointactuatorfrc": ("joint",),
  "framelinacc": ("site", "body", "xbody", "geom"),
  "frameangacc": ("site", "body", "xbody", "geom"),
  "force": ("site",),
  "torque": ("site",),
  "touch": ("site",),
  "rangefinder": ("site",),
  "tendonactuatorfrc": ("tendon",),
}


@dataclass
class ObjRef:
  """Object reference with optional entity prefixing (reference
  builtin_sensor.py:170-190)."""

  type: str
  name: str
  entity: str | None = None

  def resolved_name(self) -> str:
    return f"{self.entity}/{self.name}" if self.entity else self.name


@dataclass
class BuiltinSensorCfg(SensorCfg):
  sensor_type: str = ""
  obj: ObjRef | None = None
  ref: ObjRef | None = None

  def build(self) -> "BuiltinSensor":
    return BuiltinSensor(self)


class BuiltinSensor(Sensor):
  def __init__(self, cfg: BuiltinSensorCfg | None = None, existing: str | None = None):
    self.cfg = cfg
    self._existing = existing
    self._adr = None
    self._dim = None

  @classmethod
  def from_existing(cls, name: str) -> "BuiltinSensor":
    s = cls(cfg=SensorCfg(name=name), existing=name)
    return s

  def edit_spec(self, spec: mujoco.MjSpec, entities: dict[str, Any]) -> None:
    if self._existing is not None:
      return
    cfg = self.cfg
    assert isinstance(cfg, BuiltinSensorCfg)
    if cfg.sensor_type not in _SENSOR_TYPES:
      raise ValueError(f"Unsupported builtin sensor type '{cfg.sensor_type}'")
    allowed = _REQUIRED_OBJ.get(cfg.sensor_type)
    if allowed is None:
      # Global sensors (clock, e_potential, e_kinetic) take no object.
      sensor = spec.add_sensor(
        name=cfg.name, type=_SENSOR_TYPES[cfg.sensor_type]
      )
      return
    if cfg.obj is None or cfg.obj.type not in allowed:
      raise ValueError(
        f"Sensor '{cfg.name}' ({cfg.sensor_type}) requires obj of type {allowed}"
      )
    kwargs = {}
    if cfg.sensor_type == "rangefinder":
      kwargs["intprm"] = [1, 0, 0]  # nray=1 (required positive by the spec)
    sensor = spec.add_sensor(
      name=cfg.name,
      type=_SENSOR_TYPES[cfg.sensor_type],
      objtype=_OBJ_TYPES[cfg.obj.type],
      objname=cfg.obj.resolved_name(),
      **kwargs,
    )
    if cfg.ref is not None:
      sensor.reftype = _OBJ_TYPES[cfg.ref.type]
      sensor.refname = cfg.ref.resolved_name()

  def initialize(self, mj_model: mujoco.MjModel, ctx) -> None:
    super().initialize(mj_model, ctx)
    name = self._existing or self.cfg.name
    sid = mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_SENSOR, name)
    if sid < 0:
      raise ValueError(f"Sensor '{name}' not found in compiled model.")
    self._adr = int(mj_model.sensor_adr[sid])
    self._dim = int(mj_model.sensor_dim[sid])

  @property
  def data(self):
    return self._ctx.data.sensordata[:, self._adr : self._adr + self._dim]
