"""Fixed-capacity Gaussian map state + optimizer (functional, jit-able).

Rebuild of the reference GaussianModel
(gaussian_splatting/scene/gaussian_model.py:34-772). XLA wants static
shapes, so the dynamic cat/prune of the torch version becomes a padded
parameter store with an ``active`` mask:

- extend        -> scatter new Gaussians into free slots (cat_tensors_to_
                   optimizer semantics: Adam state zeroed for new rows)
- prune         -> clear ``active`` (and zero the Adam state so the slot is
                   clean for reuse) — optimizer-state surgery of
                   _prune_optimizer:559-579 becomes a masked zero
- densify_clone -> clone selected rows into free slots (:719-748)
- densify_split -> sample N=2 children, shrink scales by 1/(0.8 N), prune
                   parents (:669-717)

The Adam here mirrors torch.optim.Adam(lr per group, eps=1e-15) exactly
(training_setup, :321-370): update = lr * m_hat / (sqrt(v_hat) + eps),
one shared step per parameter group. Inactive slots carry zero grads and
zero moments, so a uniform masked update is bit-equivalent to torch's
row-compacted update.

Capacity growth happens on the host (python) and recompiles; it doubles,
so compilations are O(log N).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sh as sh_ops
from ..ops.gaussian_math import build_cov3d


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianMap:
    """Padded Gaussian parameter store. All arrays have leading dim
    ``capacity``; only rows with ``active`` participate in rendering."""

    xyz: jnp.ndarray            # (C, 3)
    features_dc: jnp.ndarray    # (C, 1, 3)
    features_rest: jnp.ndarray  # (C, K-1, 3)
    scaling: jnp.ndarray        # (C, 3) log-scale
    rotation: jnp.ndarray       # (C, 4) quaternion (w, x, y, z), unnormalized
    opacity: jnp.ndarray        # (C, 1) logit
    active: jnp.ndarray         # (C,) bool
    unique_kfids: jnp.ndarray   # (C,) int32
    n_obs: jnp.ndarray          # (C,) int32
    max_radii2d: jnp.ndarray    # (C,) f32
    xyz_grad_accum: jnp.ndarray # (C,) f32  (sum of ||grad mean2d_ndc||)
    denom: jnp.ndarray          # (C,) f32
    max_sh_degree: int = dataclasses.field(metadata=dict(static=True))
    active_sh_degree: int = dataclasses.field(metadata=dict(static=True))
    isotropic: bool = dataclasses.field(default=False,
                                        metadata=dict(static=True))

    # ---- derived (activations; reference gaussian_model.py:53-61) ----
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def num_active(self) -> jnp.ndarray:
        return jnp.sum(self.active.astype(jnp.int32))

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_rotation(self) -> jnp.ndarray:
        n = jnp.linalg.norm(self.rotation, axis=-1, keepdims=True)
        return self.rotation / jnp.maximum(n, 1e-12)

    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)[:, 0]

    def get_features(self) -> jnp.ndarray:
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_cov6(self, scale_modifier: float = 1.0) -> jnp.ndarray:
        return build_cov3d(self.get_scaling(), self.rotation, scale_modifier)

    def replace(self, **kw) -> "GaussianMap":
        return dataclasses.replace(self, **kw)

    # ---- construction ----
    @staticmethod
    def empty(capacity: int, max_sh_degree: int = 0,
              isotropic: bool = False, dtype=jnp.float32) -> "GaussianMap":
        k_rest = sh_ops.num_sh_coeffs(max_sh_degree) - 1
        z = lambda *s: jnp.zeros(s, dtype)
        return GaussianMap(
            xyz=z(capacity, 3),
            features_dc=z(capacity, 1, 3),
            features_rest=z(capacity, max(k_rest, 1), 3)[:, :k_rest or 1][:, :k_rest] if k_rest else z(capacity, 0, 3),
            scaling=z(capacity, 3),
            rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (capacity, 1)),
            opacity=z(capacity, 1),
            active=jnp.zeros((capacity,), bool),
            unique_kfids=jnp.zeros((capacity,), jnp.int32),
            n_obs=jnp.zeros((capacity,), jnp.int32),
            max_radii2d=z(capacity),
            xyz_grad_accum=z(capacity),
            denom=z(capacity),
            max_sh_degree=max_sh_degree,
            active_sh_degree=0,
        )


class ParamBlock(NamedTuple):
    """A padded block of candidate Gaussians with a validity mask."""

    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray
    kf_id: jnp.ndarray          # (M,) int32
    valid: jnp.ndarray          # (M,) bool


PARAM_FIELDS = ("xyz", "features_dc", "features_rest", "scaling",
                "rotation", "opacity")


# ---------------------------------------------------------------------------
# Adam optimizer with torch semantics (per-group lrs, eps=1e-15)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdamState:
    m: Dict[str, jnp.ndarray]
    v: Dict[str, jnp.ndarray]
    step: jnp.ndarray  # () int32, shared across groups like torch per-tensor


def adam_init(gm: GaussianMap) -> AdamState:
    zeros = {f: jnp.zeros_like(getattr(gm, f)) for f in PARAM_FIELDS}
    return AdamState(m=zeros,
                     v={f: jnp.zeros_like(getattr(gm, f)) for f in PARAM_FIELDS},
                     step=jnp.zeros((), jnp.int32))


def adam_update(
    gm: GaussianMap, grads: Dict[str, jnp.ndarray], state: AdamState,
    lrs: Dict[str, jnp.ndarray],
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15,
) -> Tuple[GaussianMap, AdamState]:
    """One torch-Adam step over the map parameters."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    new_m, new_v, upd = {}, {}, {}
    for f in PARAM_FIELDS:
        g = grads[f]
        m = b1 * state.m[f] + (1 - b1) * g
        v = b2 * state.v[f] + (1 - b2) * (g * g)
        new_m[f], new_v[f] = m, v
        upd[f] = lrs[f] * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    new_gm = gm.replace(**{f: getattr(gm, f) - upd[f] for f in PARAM_FIELDS})
    return new_gm, AdamState(m=new_m, v=new_v, step=step)


def xyz_lr_schedule(step, lr_init: float, lr_final: float,
                    lr_delay_mult: float, max_steps: int):
    """Log-lerp xyz LR decay (reference general_utils.py:79-94 'helper')."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    return jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)


def default_lrs(opt_params: dict, spatial_lr_scale: float,
                xyz_lr=None) -> Dict[str, jnp.ndarray]:
    """Per-group LRs, reference training_setup (gaussian_model.py:326-357)."""
    if xyz_lr is None:
        xyz_lr = opt_params["position_lr_init"] * spatial_lr_scale
    return dict(
        xyz=jnp.asarray(xyz_lr, jnp.float32),
        features_dc=jnp.asarray(opt_params["feature_lr"], jnp.float32),
        features_rest=jnp.asarray(opt_params["feature_lr"] / 20.0, jnp.float32),
        opacity=jnp.asarray(opt_params["opacity_lr"], jnp.float32),
        scaling=jnp.asarray(
            opt_params["scaling_lr"] * spatial_lr_scale, jnp.float32),
        rotation=jnp.asarray(opt_params["rotation_lr"], jnp.float32),
    )


# ---------------------------------------------------------------------------
# Masked-compaction map surgery
# ---------------------------------------------------------------------------

def _zero_state_rows(state: AdamState, rows_mask: jnp.ndarray) -> AdamState:
    def z(d):
        out = {}
        for f, a in d.items():
            m = rows_mask.reshape((-1,) + (1,) * (a.ndim - 1))
            out[f] = jnp.where(m, 0.0, a)
        return out
    return AdamState(m=z(state.m), v=z(state.v), step=state.step)


def extend(gm: GaussianMap, state: AdamState, block: ParamBlock
           ) -> Tuple[GaussianMap, AdamState, jnp.ndarray]:
    """Scatter a ParamBlock into free slots. Returns (map, state, overflow)
    where overflow is the number of valid candidates that did not fit."""
    C = gm.capacity
    M = block.valid.shape[0]
    # free slots first (stable argsort: False < True)
    free_slots = jnp.argsort(gm.active, stable=True)          # (C,)
    n_free = C - gm.num_active()
    # candidate ranks among valid entries
    cand_order = jnp.argsort(~block.valid, stable=True)       # valid first
    n_valid = jnp.sum(block.valid.astype(jnp.int32))
    n_place = jnp.minimum(n_valid, n_free)
    overflow = n_valid - n_place

    # i-th placed candidate -> free_slots[i]
    idx = jnp.arange(M)
    place = idx < n_place                                     # (M,)
    target = free_slots[jnp.minimum(idx, C - 1)]              # (M,)
    # guard: send non-placed to a scratch slot index C (dropped by scatter)
    target = jnp.where(place, target, C)

    def scat(dst, src_field):
        src = getattr(block, src_field)[cand_order]
        return dst.at[target].set(src, mode="drop")

    new_gm = gm.replace(
        xyz=scat(gm.xyz, "xyz"),
        features_dc=scat(gm.features_dc, "features_dc"),
        features_rest=scat(gm.features_rest, "features_rest"),
        scaling=scat(gm.scaling, "scaling"),
        rotation=scat(gm.rotation, "rotation"),
        opacity=scat(gm.opacity, "opacity"),
        active=gm.active.at[target].set(True, mode="drop"),
        unique_kfids=gm.unique_kfids.at[target].set(
            block.kf_id[cand_order], mode="drop"),
        n_obs=gm.n_obs.at[target].set(0, mode="drop"),
        max_radii2d=gm.max_radii2d.at[target].set(0.0, mode="drop"),
        xyz_grad_accum=gm.xyz_grad_accum.at[target].set(0.0, mode="drop"),
        denom=gm.denom.at[target].set(0.0, mode="drop"),
    )
    # new rows start with zero Adam moments (cat_tensors_to_optimizer)
    newly = jnp.zeros((C,), bool).at[target].set(True, mode="drop")
    new_state = _zero_state_rows(state, newly)
    return new_gm, new_state, overflow


def prune(gm: GaussianMap, state: AdamState, mask: jnp.ndarray
          ) -> Tuple[GaussianMap, AdamState]:
    """Deactivate rows where mask (parity with prune_points:581-597)."""
    kill = mask & gm.active
    return gm.replace(active=gm.active & ~kill), _zero_state_rows(state, kill)


def add_densification_stats(gm: GaussianMap, mean2d_grad: jnp.ndarray,
                            update_filter: jnp.ndarray,
                            width: int, height: int) -> GaussianMap:
    """Accumulate ||dL/dmean2d|| in NDC units (reference
    add_densification_stats:767-771; the CUDA backward reports mean2D
    grads pre-multiplied by 0.5*W / 0.5*H — backward.cu:728-729, 837-838 —
    so we apply the same factor to our pixel-space grads)."""
    g = mean2d_grad * jnp.asarray([0.5 * width, 0.5 * height],
                                  mean2d_grad.dtype)
    norm = jnp.linalg.norm(g, axis=-1)
    upd = update_filter & gm.active
    return gm.replace(
        xyz_grad_accum=gm.xyz_grad_accum + jnp.where(upd, norm, 0.0),
        denom=gm.denom + jnp.where(upd, 1.0, 0.0),
    )


def update_max_radii(gm: GaussianMap, radii: jnp.ndarray,
                     visibility: jnp.ndarray) -> GaussianMap:
    return gm.replace(max_radii2d=jnp.where(
        visibility & gm.active, jnp.maximum(gm.max_radii2d, radii),
        gm.max_radii2d))


def reset_opacity(gm: GaussianMap, state: AdamState,
                  value: float = 0.01) -> Tuple[GaussianMap, AdamState]:
    """reset_opacity (gaussian_model.py:438-441): opacity <-
    min(get_opacity, value) — gaussians already more transparent than
    `value` keep their opacity — and zero the opacity Adam state."""
    cur = jax.nn.sigmoid(gm.opacity)
    tgt = inverse_sigmoid(jnp.minimum(cur, value))
    new_op = jnp.where(gm.active[:, None], tgt, gm.opacity)
    m = dict(state.m); v = dict(state.v)
    m["opacity"] = jnp.zeros_like(m["opacity"])
    v["opacity"] = jnp.zeros_like(v["opacity"])
    return gm.replace(opacity=new_op), AdamState(m=m, v=v, step=state.step)


def reset_opacity_nonvisible(
    gm: GaussianMap, state: AdamState, visible_any: jnp.ndarray,
    value: float = 0.4,
) -> Tuple[GaussianMap, AdamState]:
    """reset_opacity_nonvisible (gaussian_model.py:443-451)."""
    tgt = inverse_sigmoid(jnp.full_like(gm.opacity, value))
    new_op = jnp.where((gm.active & ~visible_any)[:, None], tgt, gm.opacity)
    m = dict(state.m); v = dict(state.v)
    m["opacity"] = jnp.zeros_like(m["opacity"])
    v["opacity"] = jnp.zeros_like(v["opacity"])
    return gm.replace(opacity=new_op), AdamState(m=m, v=v, step=state.step)


def densify_and_prune(
    gm: GaussianMap, state: AdamState, key: jax.Array,
    max_grad: float, min_opacity: float, extent: float,
    max_screen_size: Optional[float], percent_dense: float = 0.01,
) -> Tuple[GaussianMap, AdamState, jnp.ndarray]:
    """densify_and_clone + densify_and_split + opacity/size prune
    (reference gaussian_model.py:669-765). Returns (map, state, overflow)."""
    grads = jnp.where(gm.denom > 0, gm.xyz_grad_accum / gm.denom, 0.0)
    scal = gm.get_scaling()
    max_scale = jnp.max(scal, axis=-1)

    # --- clone: small gaussians with big view-space grads ---
    clone_mask = (gm.active & (grads >= max_grad)
                  & (max_scale <= percent_dense * extent))
    clone_block = ParamBlock(
        xyz=gm.xyz, features_dc=gm.features_dc,
        features_rest=gm.features_rest, scaling=gm.scaling,
        rotation=gm.rotation, opacity=gm.opacity,
        kf_id=gm.unique_kfids, valid=clone_mask)
    gm, state, ov1 = extend(gm, state, clone_block)

    # --- split: large gaussians with big grads -> N=2 children ---
    split_mask = (gm.active & (grads >= max_grad)
                  & (max_scale > percent_dense * extent))
    N = 2
    from ..ops.lie import quat_to_rotmat
    R = quat_to_rotmat(gm.rotation)
    stds = gm.get_scaling()
    blocks = []
    for k in range(N):
        key, sub = jax.random.split(key)
        samples = jax.random.normal(sub, gm.xyz.shape, gm.xyz.dtype) * stds
        new_xyz = jnp.einsum("nij,nj->ni", R, samples) + gm.xyz
        new_scaling = jnp.log(stds / (0.8 * N))
        blocks.append(ParamBlock(
            xyz=new_xyz, features_dc=gm.features_dc,
            features_rest=gm.features_rest, scaling=new_scaling,
            rotation=gm.rotation, opacity=gm.opacity,
            kf_id=gm.unique_kfids, valid=split_mask))
    # prune parents BEFORE inserting children so their slots are reusable
    gm, state = prune(gm, state, split_mask)
    ov2 = jnp.zeros((), jnp.int32)
    for b in blocks:
        gm, state, ov = extend(gm, state, b)
        ov2 = ov2 + ov

    # --- prune by opacity / screen size ---
    prune_mask = gm.get_opacity() < min_opacity
    if max_screen_size is not None:
        big_vs = gm.max_radii2d > max_screen_size
        big_ws = jnp.max(gm.get_scaling(), axis=-1) > 0.1 * extent
        prune_mask = prune_mask | big_vs | big_ws
    gm, state = prune(gm, state, prune_mask)

    # reset densification stats (densification_postfix:661-663)
    gm = gm.replace(xyz_grad_accum=jnp.zeros_like(gm.xyz_grad_accum),
                    denom=jnp.zeros_like(gm.denom),
                    max_radii2d=jnp.zeros_like(gm.max_radii2d))
    return gm, state, ov1 + ov2


# ---------------------------------------------------------------------------
# Host-side helpers (not jit)
# ---------------------------------------------------------------------------

def grow(gm: GaussianMap, state: AdamState, new_capacity: int
         ) -> Tuple[GaussianMap, AdamState]:
    """Double/grow the padded capacity (host-side; triggers recompiles)."""
    C = gm.capacity
    assert new_capacity > C
    pad = new_capacity - C

    def pad_arr(a, fill=0):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=fill)

    rot_pad = jnp.concatenate(
        [gm.rotation,
         jnp.tile(jnp.asarray([1.0, 0, 0, 0], gm.rotation.dtype),
                  (pad, 1))], axis=0)  # identity quats, not zeros (NaN-safe)
    gm2 = gm.replace(
        xyz=pad_arr(gm.xyz), features_dc=pad_arr(gm.features_dc),
        features_rest=pad_arr(gm.features_rest), scaling=pad_arr(gm.scaling),
        rotation=rot_pad, opacity=pad_arr(gm.opacity),
        active=pad_arr(gm.active, False),
        unique_kfids=pad_arr(gm.unique_kfids),
        n_obs=pad_arr(gm.n_obs), max_radii2d=pad_arr(gm.max_radii2d),
        xyz_grad_accum=pad_arr(gm.xyz_grad_accum), denom=pad_arr(gm.denom))
    st2 = AdamState(
        m={f: pad_arr(a) for f, a in state.m.items()},
        v={f: pad_arr(a) for f, a in state.v.items()},
        step=state.step)
    return gm2, st2


def from_numpy(
    xyz: np.ndarray, features_dc: np.ndarray, features_rest: np.ndarray,
    scaling: np.ndarray, rotation: np.ndarray, opacity: np.ndarray,
    max_sh_degree: int, capacity: Optional[int] = None,
    active_sh_degree: Optional[int] = None,
) -> GaussianMap:
    """Build a map from raw (already log/logit-space) parameter arrays."""
    n = xyz.shape[0]
    if capacity is None:
        capacity = n
    gm = GaussianMap.empty(capacity, max_sh_degree)
    if active_sh_degree is None:
        active_sh_degree = max_sh_degree
    sl = slice(0, n)
    return gm.replace(
        xyz=gm.xyz.at[sl].set(jnp.asarray(xyz, jnp.float32)),
        features_dc=gm.features_dc.at[sl].set(
            jnp.asarray(features_dc, jnp.float32).reshape(n, 1, 3)),
        features_rest=gm.features_rest.at[sl].set(
            jnp.asarray(features_rest, jnp.float32).reshape(
                n, -1, 3)[:, : gm.features_rest.shape[1]]),
        scaling=gm.scaling.at[sl].set(jnp.asarray(scaling, jnp.float32)),
        rotation=gm.rotation.at[sl].set(jnp.asarray(rotation, jnp.float32)),
        opacity=gm.opacity.at[sl].set(
            jnp.asarray(opacity, jnp.float32).reshape(n, 1)),
        active=gm.active.at[sl].set(True),
        active_sh_degree=active_sh_degree,
    )
