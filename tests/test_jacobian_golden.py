"""Golden-array regression for the analytic Jacobian lab.

Mirrors the reference's Jacob_test_result/*.npy fixtures (dL_dtau,
grad_mu_I_pixel, grad_Sigma_I_pixel, grad_depth_per_gaussian) — the
reference's raw inputs (optimized_params_small.pt, NOCS frame 0008) are not
shipped in its repo, so the goldens here are generated from the committed
synthetic 15-Gaussian fixture by scripts/gen_jacobian_fixture.py with the
same pose-noise setup (10 deg z-rot + 0.15 m translation).

Tolerances allow for cross-machine fp32/XLA-codegen drift (the goldens were
generated once and committed; XLA CPU codegen differs across hosts by up to
~1e-3 relative on this pipeline)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def test_lab_reproduces_goldens():
    from jacobian_test import load_fixture, run

    fix = load_fixture(os.path.join(FIXDIR, "jacobian_fixture.npz"))
    gold = np.load(os.path.join(FIXDIR, "jacobian_golden.npz"))
    res = run(fix, mode="reference", verbose=False)

    np.testing.assert_allclose(res["total"], gold["dL_dtau"],
                               rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res["grads"].grad_mu),
                               gold["grad_mu"], rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res["grads"].grad_sigma),
                               gold["grad_sigma"], rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res["grads"].grad_depth),
                               gold["grad_depth"], rtol=2e-3, atol=1e-5)


def test_lab_exact_mode_matches_autodiff():
    from jacobian_test import load_fixture, run

    fix = load_fixture(os.path.join(FIXDIR, "jacobian_fixture.npz"))
    res = run(fix, mode="exact", verbose=False)
    err = np.abs(res["total"] - res["autodiff"]).max()
    rel = err / (np.abs(res["autodiff"]).max() + 1e-12)
    assert rel < 5e-4, (res["total"], res["autodiff"])
