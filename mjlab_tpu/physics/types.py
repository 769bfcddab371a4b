"""Core datatypes of the physics engine.

Design (see ARCHITECTURE.md): the compiled `mujoco.MjModel` is split into
  * `Topology` — static structure (numpy int arrays, Python ints). Never traced;
    physics functions close over it and its values are baked into the XLA
    program as constants (the analog of mjwarp's kernel specialization).
  * `Option`  — solver/integrator options; floats are jnp scalars (DR-able),
    counts (iterations) are static Python ints.
  * `Model`   — float parameter pytree (jnp). Any leaf may gain a leading env
    axis for domain randomization; `Model.axes()` builds the matching vmap
    in_axes tree (replaces reference sim/randomization.py expand_model_fields).
  * `Data`    — single-world state pytree; the env vmaps over a batched Data.

Field names mirror MjModel/MjData so users of the reference find their way.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np
from flax import struct


# ---------------------------------------------------------------------------
# Static topology (host-side, baked into traces).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TerrainGroup:
  """Runtime-broadphase collision group: mobile geoms of one type vs a pool
  of static world geoms (box terrains). The static pair table would explode
  on generated terrains (thousands of boxes × every robot geom); instead a
  host-built spatial hash over the terrain's xy extent gives each robot geom
  a fixed candidate list per step, pruned to `ncand` by distance and reduced
  to `slots` deepest contacts. The reference leans on mjwarp's GPU
  broadphase for the same problem (reference sim/sim.py:114-126)."""

  robot_type: int  # mjtGeom of the mobile geoms in this group
  robot_geoms: np.ndarray  # (R,) global geom ids
  robot_rad: np.ndarray  # (R,) bounding radii (host estimate)
  pool_type: int  # mjtGeom of the pool geoms (BOX)
  pool_geoms: np.ndarray  # (P,) global geom ids
  pool_priority: int  # uniform geom_priority of the pool
  cells: np.ndarray  # (ncx, ncy, L) global geom ids, -1 padded
  grid_lo: np.ndarray  # (2,) world xy of the grid corner
  cell_size: float
  ncand: int  # top-K candidate pool geoms per robot geom
  slots: int  # contact slots kept per robot geom
  condim: np.ndarray  # (R,) combined condim per robot geom

  def __hash__(self) -> int:
    return id(self)

  def __eq__(self, other: Any) -> bool:
    return self is other


@dataclasses.dataclass(frozen=True)
class GeomPair:
  """One candidate collision pair with static contact-slot allocation."""

  geom1: int
  geom2: int
  type1: int  # mujoco.mjtGeom
  type2: int
  ncon: int  # number of contact slots this pair occupies
  condim: int
  # Explicit <pair> element index (mjModel.pair_*), or -1 for a dynamic
  # (contype/conaffinity) pair. Explicit pairs take their contact params
  # (friction/solref/solimp/margin/gap, condim) from Model.pair_* leaves
  # instead of mj_contactParam geom mixing — mj_collision's predefined-pair
  # semantics (the reference gets this via mujoco_warp's pair table).
  pair_id: int = -1


@dataclasses.dataclass(frozen=True)
class Topology:
  # Sizes.
  nq: int
  nv: int
  nu: int
  nbody: int
  njnt: int
  ngeom: int
  nsite: int
  nsensor: int
  nsensordata: int
  nmocap: int

  # Body tree (all numpy int arrays).
  body_parentid: np.ndarray
  body_rootid: np.ndarray
  body_weldid: np.ndarray
  body_jntadr: np.ndarray
  body_jntnum: np.ndarray
  body_dofadr: np.ndarray
  body_dofnum: np.ndarray
  body_geomadr: np.ndarray
  body_geomnum: np.ndarray
  body_mocapid: np.ndarray

  # Joints.
  jnt_type: np.ndarray
  jnt_qposadr: np.ndarray
  jnt_dofadr: np.ndarray
  jnt_bodyid: np.ndarray
  jnt_limited: np.ndarray
  jnt_actfrclimited: np.ndarray

  # Dofs.
  dof_bodyid: np.ndarray
  dof_jntid: np.ndarray
  dof_parentid: np.ndarray

  # Geoms.
  geom_type: np.ndarray
  geom_bodyid: np.ndarray
  geom_condim: np.ndarray
  geom_priority: np.ndarray
  geom_dataid: np.ndarray
  # Convex-hull data (geom frame) for mesh geoms in collision pairs
  # ({geom_id: convex.Hull} — decimated verts + faces + edge directions).
  geom_hulls: dict

  # Static gravcomp selector (host copy; the traced value lives in
  # Model.body_gravcomp so it stays DR-able).
  body_gravcomp_host: np.ndarray
  # Whether the model has a fluid medium (opt.density/viscosity/wind);
  # static so fluid-free models trace no fluid code.
  has_fluid: bool

  # Sites.
  site_bodyid: np.ndarray
  site_type: np.ndarray  # mjtGeom of the site zone (touch-sensor volumes)
  site_size: np.ndarray  # (nsite, 3)

  # Actuators (joint/tendon transmissions).
  actuator_trntype: np.ndarray
  actuator_trnid: np.ndarray
  # Static transmission matrices (gear applied at eval time): length =
  # gear0 ⊙ (trn_qmat @ qpos), moment = gear0[:, None] ⊙ trn_vmat. Joint
  # rows are one-hot; fixed-tendon rows carry the tendon joint coefficients.
  trn_qmat: np.ndarray  # (nu, nq)
  trn_vmat: np.ndarray  # (nu, nv)
  # Per-tendon linear maps (fixed tendons; spatial tendons get zero rows):
  # ten_length = tendon_qmat @ qpos, ten_velocity = tendon_vmat @ qvel.
  ntendon: int
  tendon_qmat: np.ndarray  # (ntendon, nq)
  tendon_vmat: np.ndarray  # (ntendon, nv)
  tendon_length0: np.ndarray  # (ntendon,)
  tendon_invweight0: np.ndarray  # (ntendon,)
  # Spatial tendons (smooth.tendon computes dynamic length/Jacobian into
  # Data.ten_length/ten_J each step). The path is a static segment list:
  # each segment connects two sites, scaled by 1/divisor (pulley branches);
  # a segment with a wrap geom routes around it at runtime (mju_wrap).
  tendon_kind: np.ndarray  # (ntendon,) 0 = fixed (joint coefs), 1 = spatial
  tendon_seg_sites: np.ndarray  # (ntendon, S, 2) site-id pairs, -1 padded
  tendon_seg_scale: np.ndarray  # (ntendon, S) 1/divisor, 0 padded
  tendon_seg_geom: np.ndarray  # (ntendon, S) wrap geom id or -1
  tendon_seg_side: np.ndarray  # (ntendon, S) sidesite id or -1
  limited_tendon_ids: np.ndarray  # tendons with range limits (efc rows)
  # Per-actuator spatial-tendon transmission (tendon id or -1): these
  # actuator rows come from Data.ten_J instead of the static matrices.
  actuator_dyn_tendon: np.ndarray  # (nu,)
  actuator_gaintype: np.ndarray
  actuator_biastype: np.ndarray
  actuator_ctrllimited: np.ndarray
  actuator_forcelimited: np.ndarray
  # Activation dynamics (dyntype integrator/filter/filterexact; one act
  # slot per stateful actuator — mj_fwdActuation/mj_advance semantics).
  na: int
  actuator_dyntype: np.ndarray  # (nu,) mjtDyn
  actuator_actadr: np.ndarray  # (nu,) act slot or -1 if stateless
  actuator_actlimited: np.ndarray  # (nu,)
  actuator_actearly: np.ndarray  # (nu,)
  act_actuator: np.ndarray  # (na,) source actuator of each act slot

  # Sensors.
  sensor_type: np.ndarray
  sensor_datatype: np.ndarray
  sensor_objtype: np.ndarray
  sensor_objid: np.ndarray
  sensor_reftype: np.ndarray
  sensor_refid: np.ndarray
  sensor_adr: np.ndarray
  sensor_dim: np.ndarray

  # Precomputed masks / helpers.
  body_levels: tuple[np.ndarray, ...]  # body ids grouped by tree depth (>0)
  dof_ancestor_mask: np.ndarray  # (nv, nv) M[i,j]=1 iff dof j is ancestor-or-self of dof i
  body_subtree_mask: np.ndarray  # (nbody, nbody) M[i,j]=1 iff body j in subtree(i)
  body_dof_mask: np.ndarray  # (nbody, nv) M[i,j]=1 iff dof j actuates an ancestor-or-self of body i
  limited_joint_ids: np.ndarray  # limited hinge/slide joints
  limited_ball_joint_ids: np.ndarray  # limited ball joints (cone-angle rows)
  friction_dof_ids: np.ndarray  # dofs with frictionloss > 0 (row allocation)

  # Equality constraints (active-at-compile connect/weld/joint; efc rows
  # PRECEDE all other row classes, matching MuJoCo's efc layout).
  eq_type: np.ndarray  # (neq,) mjtEq
  eq_obj1id: np.ndarray  # (neq,)
  eq_obj2id: np.ndarray  # (neq,)
  eq_objtype: np.ndarray  # (neq,) mjtObj (BODY or SITE for connect/weld)
  eq_active0: np.ndarray  # (neq,) bool
  neq_rows: int  # total equality efc rows

  # Collision pair table (static slot allocation).
  pairs: tuple[GeomPair, ...]
  # Runtime-broadphase terrain groups; their contact slots follow the static
  # pair slots in Contact/efc ordering.
  terrain_groups: tuple[TerrainGroup, ...]
  ncon_max: int  # total contact slots (static pairs + terrain slots)
  nefc: int  # total constraint rows (limits + friction + contacts)

  # Heightfield prototypes (static raster data lives in Model.hfield_data).
  nhfield: int
  hfield_nrow: np.ndarray
  hfield_ncol: np.ndarray
  hfield_adr: np.ndarray

  def __hash__(self) -> int:  # identity hash: each compiled model is unique
    return id(self)

  def __eq__(self, other: Any) -> bool:
    return self is other


# ---------------------------------------------------------------------------
# Options.
# ---------------------------------------------------------------------------


class Integrator:
  EULER = 0
  IMPLICITFAST = 1
  RK4 = 2


class ConeType:
  PYRAMIDAL = 0
  ELLIPTIC = 1


@struct.dataclass
class Option:
  """Solver options. Static fields control trace structure."""

  timestep: jax.Array
  gravity: jax.Array  # (3,)
  magnetic: jax.Array  # (3,) global magnetic field (magnetometer sensors)
  impratio: jax.Array
  tolerance: jax.Array
  ls_tolerance: jax.Array
  # Fluid medium (inertia-box model; zero-cost when Topology.has_fluid
  # is False — the passive-force branch is not traced at all).
  density: jax.Array = 0.0
  viscosity: jax.Array = 0.0
  wind: jax.Array = dataclasses.field(default_factory=lambda: np.zeros(3))
  # Static (affect compiled program structure):
  integrator: int = struct.field(pytree_node=False, default=Integrator.EULER)
  cone: int = struct.field(pytree_node=False, default=ConeType.PYRAMIDAL)
  # mjtSolver: 1 = CG (Polak-Ribière, M-preconditioned), 2 = Newton.
  solver: int = struct.field(pytree_node=False, default=2)
  iterations: int = struct.field(pytree_node=False, default=10)
  ls_iterations: int = struct.field(pytree_node=False, default=20)
  ls_parallel: bool = struct.field(pytree_node=False, default=False)


# ---------------------------------------------------------------------------
# Model parameters (jnp pytree; leaves may be per-env batched for DR).
# ---------------------------------------------------------------------------


@struct.dataclass
class Model:
  opt: Option

  qpos0: jax.Array
  qpos_spring: jax.Array

  body_pos: jax.Array
  body_quat: jax.Array
  body_ipos: jax.Array
  body_iquat: jax.Array
  body_mass: jax.Array
  body_inertia: jax.Array
  body_invweight0: jax.Array
  body_subtreemass: jax.Array
  body_gravcomp: jax.Array

  jnt_axis: jax.Array
  jnt_pos: jax.Array
  jnt_range: jax.Array
  jnt_stiffness: jax.Array
  jnt_margin: jax.Array
  jnt_solref: jax.Array
  jnt_solimp: jax.Array

  dof_armature: jax.Array
  dof_damping: jax.Array
  dof_frictionloss: jax.Array
  dof_invweight0: jax.Array
  dof_solref: jax.Array
  dof_solimp: jax.Array

  geom_pos: jax.Array
  geom_quat: jax.Array
  geom_size: jax.Array
  geom_friction: jax.Array
  geom_solref: jax.Array
  geom_solimp: jax.Array
  geom_solmix: jax.Array
  # NOTE: geom_gap/pair_gap are intentionally NOT carried: includemargin is
  # margin alone (MuJoCo >= 3.10 semantics, collision.py), so gap never
  # reaches device code — pyproject pins mujoco>=3.10 accordingly.
  geom_margin: jax.Array

  # Explicit <pair> contact parameters (npair rows; empty when the model
  # declares none). Consumed by collision._combine_params_vec for pairs
  # whose GeomPair.pair_id >= 0.
  pair_friction: jax.Array  # (npair, 5)
  pair_solref: jax.Array  # (npair, 2)
  pair_solreffriction: jax.Array  # (npair, 2) zeros → use pair_solref
  pair_solimp: jax.Array  # (npair, 5)
  pair_margin: jax.Array  # (npair,)

  site_pos: jax.Array
  site_quat: jax.Array

  actuator_gainprm: jax.Array
  actuator_biasprm: jax.Array
  actuator_gear: jax.Array
  actuator_ctrlrange: jax.Array
  actuator_forcerange: jax.Array
  actuator_dynprm: jax.Array  # (nu, 10) activation time constants
  actuator_actrange: jax.Array  # (nu, 2)
  actuator_lengthrange: jax.Array  # (nu, 2) muscle operating range
  actuator_acc0: jax.Array  # (nu,) unit-gain acceleration at qpos0 (muscle)

  hfield_data: jax.Array  # concatenated raster data, () if no hfields
  hfield_size: jax.Array  # (nhfield, 4)

  eq_solref: jax.Array  # (neq, 2)
  eq_solimp: jax.Array  # (neq, 5)
  eq_data: jax.Array  # (neq, 11) anchors / polycoef / relpose per type

  tendon_range: jax.Array  # (ntendon, 2)
  tendon_margin: jax.Array  # (ntendon,)
  tendon_stiffness: jax.Array  # (ntendon,)
  tendon_damping: jax.Array  # (ntendon,)
  tendon_lengthspring: jax.Array  # (ntendon, 2) spring deadband
  tendon_solref_lim: jax.Array  # (ntendon, 2)
  tendon_solimp_lim: jax.Array  # (ntendon, 5)

  def axes(self, batched: set[str] | tuple[str, ...] = ()) -> "Model":
    """vmap in_axes tree: 0 for DR-batched leaves, None elsewhere."""
    batched = set(batched)
    flat = {}
    for f in dataclasses.fields(self):
      if f.name == "opt":
        opt_axes = Option(
          timestep=0 if "opt.timestep" in batched else None,
          gravity=0 if "opt.gravity" in batched else None,
          magnetic=None,
          impratio=None,
          tolerance=None,
          ls_tolerance=None,
          density=0 if "opt.density" in batched else None,
          viscosity=0 if "opt.viscosity" in batched else None,
          wind=0 if "opt.wind" in batched else None,
          integrator=self.opt.integrator,
          cone=self.opt.cone,
          iterations=self.opt.iterations,
          ls_iterations=self.opt.ls_iterations,
          ls_parallel=self.opt.ls_parallel,
        )
        flat[f.name] = opt_axes
      else:
        flat[f.name] = 0 if f.name in batched else None
    return Model(**flat)  # type: ignore[arg-type]


# ---------------------------------------------------------------------------
# Contacts.
# ---------------------------------------------------------------------------


@struct.dataclass
class Contact:
  """Fixed-capacity contact slots (ncon_max rows). Slot→geom mapping is static
  (Topology.pairs); a slot is *active* when dist < includemargin."""

  dist: jax.Array  # (C,)
  pos: jax.Array  # (C, 3)
  frame: jax.Array  # (C, 3, 3) rows: normal (g1→g2), tangent1, tangent2
  includemargin: jax.Array  # (C,)
  friction: jax.Array  # (C, 5)
  solref: jax.Array  # (C, 2)
  solimp: jax.Array  # (C, 5)
  # Friction-row solref override (explicit <pair> only; all-zero rows mean
  # "use solref"). Elliptic friction rows take their damping from this —
  # pyramidal facets ignore it (probed vs mj_forward efc_KBIP).
  solreffriction: jax.Array  # (C, 2)


# ---------------------------------------------------------------------------
# Data (single-world state).
# ---------------------------------------------------------------------------


@struct.dataclass
class Data:
  # Inputs / generalized state.
  time: jax.Array
  qpos: jax.Array  # (nq,)
  qvel: jax.Array  # (nv,)
  act: jax.Array  # (na,) actuator activation state
  ctrl: jax.Array  # (nu,)
  qfrc_applied: jax.Array  # (nv,)
  xfrc_applied: jax.Array  # (nbody, 6) [force, torque] in world frame
  mocap_pos: jax.Array  # (nmocap, 3)
  mocap_quat: jax.Array  # (nmocap, 4)

  # Warmstart.
  qacc_warmstart: jax.Array  # (nv,)

  # Kinematics.
  xanchor: jax.Array  # (njnt, 3)
  xaxis: jax.Array  # (njnt, 3)
  xpos: jax.Array  # (nbody, 3)
  xquat: jax.Array  # (nbody, 4)
  xmat: jax.Array  # (nbody, 3, 3)
  xipos: jax.Array  # (nbody, 3)
  ximat: jax.Array  # (nbody, 3, 3)
  geom_xpos: jax.Array  # (ngeom, 3)
  geom_xmat: jax.Array  # (ngeom, 3, 3)
  site_xpos: jax.Array  # (nsite, 3)
  site_xmat: jax.Array  # (nsite, 3, 3)

  # CoM-based quantities.
  subtree_com: jax.Array  # (nbody, 3)
  cinert: jax.Array  # (nbody, 10)
  cdof: jax.Array  # (nv, 6)
  cvel: jax.Array  # (nbody, 6)
  cdof_dot: jax.Array  # (nv, 6)

  # Tendons (dynamic path state; fixed tendons get their static maps,
  # spatial tendons the site-chain geometry — smooth.tendon).
  ten_length: jax.Array  # (ntendon,)
  ten_velocity: jax.Array  # (ntendon,)
  ten_J: jax.Array  # (ntendon, nv)

  # Mass matrix.
  qM: jax.Array  # (nv, nv) dense
  qLD: jax.Array  # (nv, nv) Cholesky factor (lower)

  # Forces.
  qfrc_bias: jax.Array  # (nv,)
  qfrc_passive: jax.Array  # (nv,)
  qfrc_spring: jax.Array  # (nv,)
  qfrc_damper: jax.Array  # (nv,)
  actuator_length: jax.Array  # (nu,)
  actuator_velocity: jax.Array  # (nu,)
  actuator_force: jax.Array  # (nu,)
  act_dot: jax.Array  # (na,) activation time-derivative
  qfrc_actuator: jax.Array  # (nv,)
  qfrc_smooth: jax.Array  # (nv,)
  qacc_smooth: jax.Array  # (nv,)

  # Constraints.
  contact: Contact
  efc_J: jax.Array  # (nefc, nv)
  efc_D: jax.Array  # (nefc,)
  efc_aref: jax.Array  # (nefc,)
  efc_pos: jax.Array  # (nefc,)
  efc_margin: jax.Array  # (nefc,)
  efc_frictionloss: jax.Array  # (nefc,)
  efc_force: jax.Array  # (nefc,)
  qfrc_constraint: jax.Array  # (nv,)

  # Output.
  qacc: jax.Array  # (nv,)

  # Sensors.
  sensordata: jax.Array  # (nsensordata,)

  # Subtree dynamics (for subtree momentum sensors).
  subtree_linvel: jax.Array  # (nbody, 3)
  subtree_angmom: jax.Array  # (nbody, 3)

  # Diagnostics: active terrain-pool contact candidates dropped this step
  # because the per-geom slot capacity was saturated (scalar int32; counted
  # in collision._terrain_group_contacts, surfaced as
  # extras["log"]["Metrics/physics/terrain_slots_dropped"]).
  ncon_dropped: jax.Array
