from mjlab_tpu.sensors.sensor import Sensor, SensorCfg
from mjlab_tpu.sensors.builtin_sensor import BuiltinSensor, BuiltinSensorCfg
from mjlab_tpu.sensors.contact_sensor import (
  ContactData,
  ContactMatch,
  ContactSensor,
  ContactSensorCfg,
)

__all__ = [
  "BuiltinSensor",
  "BuiltinSensorCfg",
  "ContactData",
  "ContactMatch",
  "ContactSensor",
  "ContactSensorCfg",
  "Sensor",
  "SensorCfg",
]
