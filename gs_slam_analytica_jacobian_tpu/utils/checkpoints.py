"""Checkpoint ingestion: reference .pt (TorchScript) maps -> GaussianMap.

The reference's Jacobian lab loads optimized maps saved as TorchScript
modules whose named parameters are, in order:
[xyz, features_dc, features_rest, opacity, scaling, rotation]
(gaussian_splatting/scene/gaussian_model.py:70-138, load_tensors).

This module reads those files on HOST with CPU torch (baked into the
image), converts to numpy/npz, and builds a device GaussianMap — so the
TPU build can consume reference-produced maps directly. torch is imported
lazily; everything else is torch-free.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

_PT_FIELDS = ("xyz", "features_dc", "features_rest", "opacity", "scaling",
              "rotation")


def load_pt_tensors(path: str) -> Dict[str, np.ndarray]:
    """torch.jit.load a reference checkpoint -> dict of numpy arrays."""
    import torch

    mod = torch.jit.load(path, map_location="cpu")
    tensors = [p.detach().cpu().numpy() for _, p in mod.named_parameters()]
    if len(tensors) < 6:
        raise ValueError(
            f"expected >= 6 parameters in {path}, got {len(tensors)}")
    out = dict(zip(_PT_FIELDS, tensors[:6]))
    if out["features_dc"].ndim == 2:                    # (N,3) -> (N,1,3)
        out["features_dc"] = out["features_dc"][:, None, :]
    return out


def pt_to_npz(pt_path: str, npz_path: Optional[str] = None) -> str:
    """One-shot converter so later runs need no torch at all."""
    if npz_path is None:
        npz_path = os.path.splitext(pt_path)[0] + ".npz"
    np.savez(npz_path, **load_pt_tensors(pt_path))
    return npz_path


def load_npz_tensors(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in _PT_FIELDS}


def load_tensors(path: str, capacity: Optional[int] = None):
    """Reference GaussianModel.load_tensors parity: build a GaussianMap
    from a .pt (TorchScript) or converted .npz checkpoint."""
    from ..models import gaussian_map as gmap

    t = (load_npz_tensors(path) if path.endswith(".npz")
         else load_pt_tensors(path))
    n = t["xyz"].shape[0]
    k_rest = t["features_rest"].shape[1] if t["features_rest"].ndim == 3 \
        else 0
    # sh degree from rest coeff count: (deg+1)^2 - 1
    deg = int(round((k_rest + 1) ** 0.5)) - 1
    fr = t["features_rest"].reshape(n, k_rest, 3) if k_rest else \
        np.zeros((n, 0, 3), np.float32)
    return gmap.from_numpy(
        xyz=t["xyz"].astype(np.float32),
        features_dc=t["features_dc"].astype(np.float32),
        features_rest=fr.astype(np.float32),
        scaling=t["scaling"].astype(np.float32),
        rotation=t["rotation"].astype(np.float32),
        opacity=t["opacity"].reshape(n, 1).astype(np.float32),
        max_sh_degree=max(deg, 0),
        active_sh_degree=max(deg, 0),
        capacity=capacity)


def main():  # pragma: no cover - thin CLI
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert a reference .pt gaussian checkpoint to .npz")
    ap.add_argument("pt_path")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = pt_to_npz(args.pt_path, args.out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
