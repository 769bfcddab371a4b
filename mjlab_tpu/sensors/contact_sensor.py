"""Contact sensor: regex-driven contact tracking over the static slot table.

TPU-native redesign of the reference's ContactSensor (sensor/contact_sensor.py):
instead of expanding to native mjSENS_CONTACT sensors with intprm match
machinery, we resolve the (primary × secondary) geom matches to *static
contact-slot index sets* in the engine's pair table at initialize time, and
reduce over them with fixed shapes every step. Field/reduce semantics follow
the reference (found/force/torque/dist/pos/normal/tangent;
none/mindist/maxforce/netforce — reference contact_sensor.py:16-41),
and the air-time state machine (contact_sensor.py:113-121,327-367) is carried
as functional state.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Literal

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.physics import constraint as _constraint
from mjlab_tpu.sensors.sensor import Sensor, SensorCfg


@dataclass
class ContactMatch:
  """One side of a contact match (reference contact_sensor.py:50-63)."""

  mode: Literal["geom", "body", "subtree"]
  pattern: str | tuple[str, ...]
  entity: str | None = None
  exclude: tuple[str, ...] = ()


@dataclass
class ContactSensorCfg(SensorCfg):
  primary: ContactMatch = None  # type: ignore[assignment]
  secondary: ContactMatch | None = None
  fields: tuple[str, ...] = ("found", "force")
  reduce: Literal["none", "mindist", "maxforce", "netforce"] = "maxforce"
  num_slots: int = 1
  secondary_policy: Literal["first", "any", "error"] = "first"
  track_air_time: bool = False
  global_frame: bool = False
  debug: bool = False

  def build(self) -> "ContactSensor":
    return ContactSensor(self)


@dataclass
class ContactData:
  found: jax.Array | None = None  # [B, N]
  force: jax.Array | None = None  # [B, N, 3]
  torque: jax.Array | None = None  # [B, N, 3] torsion/rolling (condim ≥ 4)
  dist: jax.Array | None = None  # [B, N]
  pos: jax.Array | None = None  # [B, N, 3]
  normal: jax.Array | None = None  # [B, N, 3]
  tangent: jax.Array | None = None  # [B, N, 3]
  current_air_time: jax.Array | None = None
  last_air_time: jax.Array | None = None
  current_contact_time: jax.Array | None = None
  last_contact_time: jax.Array | None = None


def _match_names(patterns, names, exclude):
  if isinstance(patterns, str):
    patterns = (patterns,)
  pats = [re.compile(p) for p in patterns]
  exc = [re.compile(p) for p in exclude]
  out = [
    n for n in names
    if any(p.fullmatch(n) for p in pats) and not any(e.fullmatch(n) for e in exc)
  ]
  return out


class ContactSensor(Sensor[ContactData]):
  def __init__(self, cfg: ContactSensorCfg) -> None:
    self.cfg = cfg

  def edit_spec(self, spec: mujoco.MjSpec, entities: dict[str, Any]) -> None:
    # No spec additions needed: slots are resolved from the engine pair table.
    self._entities = entities

  # -- resolution ---------------------------------------------------------------

  def _resolve_items(self, mj_model, match: ContactMatch) -> list[tuple[str, set]]:
    """Match → list of (name, geom-id set)."""

    def all_names(objtype):
      n = mj_model.nbody if objtype == "body" else mj_model.ngeom
      kind = (
        mujoco.mjtObj.mjOBJ_BODY if objtype == "body" else mujoco.mjtObj.mjOBJ_GEOM
      )
      return [mujoco.mj_id2name(mj_model, kind, i) or "" for i in range(n)]

    def scope_one(p: str) -> str:
      # Keep a leading anchor in front of the entity prefix: "^foot$" must
      # become "^robot/foot$", not "robot/^foot$".
      if p.startswith("^"):
        return f"^{re.escape(match.entity)}/{p[1:]}"
      return f"{re.escape(match.entity)}/{p}"

    def scoped(patterns):
      if match.entity is None:
        return patterns
      pats = patterns if isinstance(patterns, tuple) else (patterns,)
      return tuple(scope_one(p) for p in pats)

    exclude = tuple(
      scope_one(p) if match.entity else p for p in match.exclude
    )

    if match.mode == "geom":
      names = _match_names(scoped(match.pattern), all_names("geom"), exclude)
      return [
        (n, {mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_GEOM, n)})
        for n in names
      ]

    body_names = _match_names(scoped(match.pattern), all_names("body"), exclude)
    items = []
    for n in body_names:
      bid = mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_BODY, n)
      if match.mode == "body":
        bids = [bid]
      else:  # subtree
        bids = [
          b for b in range(mj_model.nbody)
          if _is_in_subtree(mj_model, b, bid)
        ]
      geoms = set()
      for b in bids:
        adr, num = mj_model.body_geomadr[b], mj_model.body_geomnum[b]
        geoms.update(range(adr, adr + num))
      items.append((n, geoms))
    return items

  def initialize(self, mj_model: mujoco.MjModel, ctx) -> None:
    super().initialize(mj_model, ctx)
    tp = ctx.tp
    primaries = self._resolve_items(mj_model, self.cfg.primary)
    if not primaries:
      raise ValueError(f"Contact sensor '{self.cfg.name}': no primary matches.")
    if self.cfg.secondary is not None:
      secondary_sets = self._resolve_items(mj_model, self.cfg.secondary)
      secondary: set | None = set().union(*(s for _, s in secondary_sets))
    else:
      secondary = None

    # Slot geom sets, in slot-table order: static pairs, then terrain-group
    # slots (whose geom1 varies at runtime over the terrain pool — matched
    # against the whole pool, see physics/types.TerrainGroup).
    slot_s1: list[frozenset] = []
    slot_s2: list[frozenset] = []
    for p in tp.pairs:
      for _ in range(p.ncon):
        slot_s1.append(frozenset((p.geom1,)))
        slot_s2.append(frozenset((p.geom2,)))
    for tg in tp.terrain_groups:
      pool = frozenset(int(g) for g in tg.pool_geoms)
      for g in tg.robot_geoms:
        for _ in range(tg.slots):
          slot_s1.append(pool)
          slot_s2.append(frozenset((int(g),)))

    self.item_names = [n for n, _ in primaries]
    per_item_slots, per_item_flip = [], []
    for name, pset in primaries:
      slots, flips = [], []
      for k in range(len(slot_s1)):
        s1set, s2set = slot_s1[k], slot_s2[k]
        p1, p2 = bool(s1set & pset), bool(s2set & pset)
        s1 = secondary is None or bool(s1set & secondary)
        s2 = secondary is None or bool(s2set & secondary)
        if p1 and s2:
          slots.append(k)
          flips.append(1.0)  # force on geom2... primary is g1 → flip
        elif p2 and s1:
          slots.append(k)
          flips.append(-1.0)
      per_item_slots.append(slots)
      per_item_flip.append(flips)

    # De-duplicate symmetric double counting for self-matching sensors.
    for i in range(len(per_item_slots)):
      seen, slots, flips = set(), [], []
      for s, f in zip(per_item_slots[i], per_item_flip[i]):
        if s in seen:
          continue
        seen.add(s)
        slots.append(s)
        flips.append(f)
      per_item_slots[i], per_item_flip[i] = slots, flips

    smax = max(1, max(len(s) for s in per_item_slots))
    N = len(per_item_slots)
    self._slot_idx = np.zeros((N, smax), dtype=np.int64)
    self._slot_valid = np.zeros((N, smax), dtype=bool)
    self._slot_sign = np.zeros((N, smax))
    for i, (slots, flips) in enumerate(zip(per_item_slots, per_item_flip)):
      self._slot_idx[i, : len(slots)] = slots
      self._slot_valid[i, : len(slots)] = True
      # Sign convention: contact normal points geom1 → geom2; the force ON the
      # primary from the other geom is +f when primary is geom2.
      self._slot_sign[i, : len(slots)] = [-f for f in flips]
    self.num_items = N

  # -- state ----------------------------------------------------------------------

  def init_state(self) -> dict:
    if not self.cfg.track_air_time:
      return {}
    B, N = self._ctx.num_envs, self.num_items
    z = jnp.zeros((B, N), dtype=self._ctx.dtype)
    return {
      "current_air_time": z,
      "last_air_time": z,
      "current_contact_time": z,
      "last_contact_time": z,
    }

  @property
  def state(self) -> dict:
    return self._ctx.ns("scene")["sensors"][self.cfg.name]

  # -- compute ----------------------------------------------------------------------

  def _gather(self):
    """Per-slot quantities gathered for this sensor: (B, N, S)."""
    d = self._ctx.data
    idx = self._slot_idx
    dist = d.contact.dist[:, idx]  # (B, N, S)
    active = (dist < d.contact.includemargin[:, idx]) & jnp.asarray(
      self._slot_valid
    )
    return dist, active

  @property
  def data(self) -> ContactData:
    cfg = self.cfg
    d = self._ctx.data
    idx = self._slot_idx
    valid = jnp.asarray(self._slot_valid)
    sign = jnp.asarray(self._slot_sign, dtype=self._ctx.dtype)
    dist, active = self._gather()
    found = jnp.sum(active, axis=-1)  # (B, N)

    out = ContactData()
    if "found" in cfg.fields:
      out.found = found.astype(self._ctx.dtype)
    need_force = (
      "force" in cfg.fields
      or "torque" in cfg.fields
      or cfg.reduce in ("maxforce", "netforce")
    )
    if need_force:
      w_all = self._ctx.contact_forces()  # (B, C, 6) wrench, contact frame
      f_local = w_all[:, idx, :3] * active[..., None]  # (B, N, S, 3)
      t_local = w_all[:, idx, 3:] * active[..., None]
    frames = d.contact.frame[:, idx]  # (B, N, S, 3, 3)
    pos = d.contact.pos[:, idx]

    def pick(a, sel):
      return jnp.take_along_axis(a, sel[..., None, None], axis=2)[:, :, 0]

    torque = None
    if cfg.reduce == "netforce":
      # World-frame net wrench on the primary; torque is taken about the
      # active-weighted centroid of the contact points (the reference's
      # mjSENS_CONTACT netforce reduce combines contacts the same way).
      f_world = jnp.einsum("bnsi,bnsij->bnsj", f_local, frames) * sign[..., None]
      force = jnp.sum(f_world, axis=2)
      if "torque" in cfg.fields:
        t_world = jnp.einsum("bnsi,bnsij->bnsj", t_local, frames) * sign[..., None]
        wsum = jnp.maximum(jnp.sum(active, axis=-1, keepdims=True), 1)
        centroid = (
          jnp.sum(pos * active[..., None], axis=2) / wsum
        )  # (B, N, 3)
        arm = pos - centroid[:, :, None]
        torque = jnp.sum(t_world + jnp.cross(arm, f_world), axis=2)
      sel = jnp.argmin(jnp.where(active, dist, jnp.inf), axis=-1)
    else:
      if cfg.reduce == "maxforce":
        normal_mag = jnp.where(active, jnp.abs(f_local[..., 0]), -jnp.inf)
        sel = jnp.argmax(normal_mag, axis=-1)  # (B, N)
      elif cfg.reduce == "mindist":
        sel = jnp.argmin(jnp.where(valid, dist, jnp.inf), axis=-1)
      else:  # "none": first valid slot
        sel = jnp.argmax(active, axis=-1)
      force = pick(f_local, sel) if need_force else None
      if need_force and "torque" in cfg.fields:
        torque = pick(t_local, sel)
      if cfg.global_frame and need_force:
        # Rotate the selected wrench into the world frame, oriented as the
        # force/torque ON the primary (sign flips when primary is geom1).
        frame_s = pick(frames.reshape(frames.shape[:3] + (9,)), sel).reshape(
          frames.shape[:2] + (3, 3)
        )
        sgn_s = jnp.take_along_axis(
          jnp.broadcast_to(sign, dist.shape[:1] + sign.shape), sel[..., None], -1
        )
        force = jnp.einsum("bni,bnij->bnj", force, frame_s) * sgn_s
        if torque is not None:
          torque = jnp.einsum("bni,bnij->bnj", torque, frame_s) * sgn_s

    if "force" in cfg.fields:
      out.force = force
    if "torque" in cfg.fields:
      out.torque = torque
    if "dist" in cfg.fields:
      out.dist = jnp.take_along_axis(dist, sel[..., None], axis=-1)[..., 0]
    if "pos" in cfg.fields:
      out.pos = jnp.take_along_axis(pos, sel[..., None, None], axis=2)[:, :, 0]
    if "normal" in cfg.fields or "tangent" in cfg.fields:
      frame_sel = jnp.take_along_axis(
        frames, sel[..., None, None, None], axis=2
      )[:, :, 0]
      sgn = jnp.take_along_axis(
        jnp.broadcast_to(sign, dist.shape[:1] + sign.shape), sel[..., None], -1
      )[..., 0][..., None]
      if "normal" in cfg.fields:
        out.normal = frame_sel[:, :, 0] * sgn
      if "tangent" in cfg.fields:
        out.tangent = frame_sel[:, :, 1]

    if cfg.track_air_time:
      st = self.state
      out.current_air_time = st["current_air_time"]
      out.last_air_time = st["last_air_time"]
      out.current_contact_time = st["current_contact_time"]
      out.last_contact_time = st["last_contact_time"]
    return out

  # -- air time state machine (reference contact_sensor.py:327-367) ---------------

  def update(self, dt: float) -> None:
    if not self.cfg.track_air_time:
      return
    _, active = self._gather()
    in_contact = jnp.any(active, axis=-1)  # (B, N)
    st = self.state
    cat = st["current_air_time"]
    cct = st["current_contact_time"]
    first_contact = in_contact & (cat > 0)
    first_air = (~in_contact) & (cct > 0)
    st["last_air_time"] = jnp.where(first_contact, cat + dt, st["last_air_time"])
    st["current_air_time"] = jnp.where(in_contact, 0.0, cat + dt)
    st["last_contact_time"] = jnp.where(first_air, cct + dt, st["last_contact_time"])
    st["current_contact_time"] = jnp.where(in_contact, cct + dt, 0.0)

  def compute_first_contact(self, dt: float) -> jax.Array:
    """Envs whose item touched down within the last dt window
    (reference contact_sensor.py:260-280)."""
    st = self.state
    _, active = self._gather()
    in_contact = jnp.any(active, axis=-1)
    return in_contact & (st["last_air_time"] > 0) & (
      st["current_contact_time"] <= dt + 1e-9
    )

  def compute_first_air(self, dt: float) -> jax.Array:
    st = self.state
    _, active = self._gather()
    in_contact = jnp.any(active, axis=-1)
    return (~in_contact) & (st["last_contact_time"] > 0) & (
      st["current_air_time"] <= dt + 1e-9
    )

  def reset(self, env_mask=None) -> None:
    if not self.cfg.track_air_time:
      return
    st = self.state
    for k in list(st):
      if env_mask is None:
        st[k] = jnp.zeros_like(st[k])
      else:
        st[k] = jnp.where(env_mask[:, None], 0.0, st[k])


def _is_in_subtree(mj_model, body: int, root: int) -> bool:
  b = body
  while True:
    if b == root:
      return True
    if b == 0:
      return False
    b = int(mj_model.body_parentid[b])
