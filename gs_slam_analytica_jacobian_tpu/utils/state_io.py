"""Mid-run SLAM state checkpoint / resume.

The reference only SAVES final outputs (PLY via save_gaussians,
eval_utils.py:183-192) — it cannot resume an interrupted run. Because this
framework's state is functional pytrees, a full checkpoint is just the
leaves: the Gaussian map + its Adam state, the keyframe store + pose Adam,
and the frontend's host bookkeeping. Stored as one .npz.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..models.gaussian_map import AdamState, GaussianMap
from ..slam.mapping import KFStore, PoseAdamState


def save_state(path: str, gm: GaussianMap, gm_adam: AdamState,
               store: KFStore, pose_adam: PoseAdamState,
               meta: dict | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for f in gm.__dataclass_fields__:
        v = getattr(gm, f)
        if isinstance(v, (jnp.ndarray, np.ndarray)):
            arrays[f"gm.{f}"] = np.asarray(v)
    for name, d in (("m", gm_adam.m), ("v", gm_adam.v)):
        for k, a in d.items():
            arrays[f"adam.{name}.{k}"] = np.asarray(a)
    arrays["adam.step"] = np.asarray(gm_adam.step)
    for f in store.__dataclass_fields__:
        arrays[f"store.{f}"] = np.asarray(getattr(store, f))
    arrays["pose_adam.m"] = np.asarray(pose_adam.m)
    arrays["pose_adam.v"] = np.asarray(pose_adam.v)
    arrays["pose_adam.step"] = np.asarray(pose_adam.step)
    arrays["meta"] = np.frombuffer(
        json.dumps(dict(meta or {},
                        max_sh_degree=gm.max_sh_degree,
                        active_sh_degree=gm.active_sh_degree,
                        isotropic=gm.isotropic)
                   ).encode(), np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path: str) -> Tuple[GaussianMap, AdamState, KFStore,
                                   PoseAdamState, dict]:
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    meta = json.loads(bytes(arrays.pop("meta")).decode())

    gm_kwargs = {k[3:]: jnp.asarray(v) for k, v in arrays.items()
                 if k.startswith("gm.")}
    gm = GaussianMap(**gm_kwargs, max_sh_degree=meta["max_sh_degree"],
                     active_sh_degree=meta["active_sh_degree"],
                     isotropic=meta.get("isotropic", False))

    m = {k.split(".", 2)[2]: jnp.asarray(v) for k, v in arrays.items()
         if k.startswith("adam.m.")}
    v = {k.split(".", 2)[2]: jnp.asarray(v) for k, v in arrays.items()
         if k.startswith("adam.v.")}
    gm_adam = AdamState(m=m, v=v, step=jnp.asarray(arrays["adam.step"]))

    st = {k[6:]: a for k, a in arrays.items() if k.startswith("store.")}
    if "depth_scale" not in st:
        # checkpoint format v1 (pre-r4): f32 images/depths, no per-slot
        # depth scale. Quantize through the KFStore.add semantics so old
        # checkpoints keep loading (u8 RGB; u16 depth at dmax/65535).
        img = np.clip(np.asarray(st["gt_image"], np.float32), 0.0, 1.0)
        st["gt_image"] = np.round(img * 255.0).astype(np.uint8)
        dep = np.maximum(np.asarray(st["gt_depth"], np.float32), 0.0)
        dmax = dep.reshape(dep.shape[0], -1).max(axis=1)
        scale = np.where(dmax > 0, dmax / 65535.0, 0.0).astype(np.float32)
        st["gt_depth"] = np.round(
            dep / np.maximum(scale, 1e-12)[:, None, None, None]
        ).astype(np.uint16)
        st["depth_scale"] = scale
    store = KFStore(**{k: jnp.asarray(a) for k, a in st.items()})
    pose_adam = PoseAdamState(
        m=jnp.asarray(arrays["pose_adam.m"]),
        v=jnp.asarray(arrays["pose_adam.v"]),
        step=jnp.asarray(arrays["pose_adam.step"]))
    return gm, gm_adam, store, pose_adam, meta


def save_backend(path: str, backend, extra_meta: dict | None = None):
    """Checkpoint a BackEnd instance (host bookkeeping included)."""
    meta = dict(extra_meta or {})
    meta["uid_to_slot"] = {str(k): v for k, v in backend.uid_to_slot.items()}
    meta["current_window"] = list(backend.current_window)
    meta["iteration_count"] = backend.iteration_count
    meta["initialized"] = bool(backend.initialized)
    save_state(path, backend.gm, backend.gm_adam, backend.store,
               backend.pose_adam, meta)


def load_backend(path: str, backend):
    """Restore a BackEnd instance in place; returns the meta dict."""
    gm, gm_adam, store, pose_adam, meta = load_state(path)
    backend.gm = gm
    backend.gm_adam = gm_adam
    backend.store = store
    backend.pose_adam = pose_adam
    backend.uid_to_slot = {int(k): v
                           for k, v in meta["uid_to_slot"].items()}
    backend.current_window = list(meta["current_window"])
    backend.iteration_count = int(meta["iteration_count"])
    backend.initialized = bool(meta["initialized"])
    return meta
