import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from gs_slam_analytica_jacobian_tpu.ops import lie


def test_skew():
    v = jnp.array([1.0, 2.0, 3.0])
    S = lie.skew(v)
    np.testing.assert_allclose(
        np.asarray(S),
        np.array([[0, -3, 2], [3, 0, -1], [-2, 1, 0]], dtype=np.float32),
    )
    # skew(v) @ u == cross(v, u)
    u = jnp.array([0.5, -1.0, 2.0])
    np.testing.assert_allclose(np.asarray(S @ u), np.cross(v, u), rtol=1e-6)


@pytest.mark.parametrize("scale", [1.0, 1e-7, 0.0])
def test_so3_exp_matches_scipy(scale, rng):
    theta = rng.normal(size=3).astype(np.float32) * scale
    R = lie.so3_exp(jnp.asarray(theta))
    R_ref = Rotation.from_rotvec(theta).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=5e-4)


def test_se3_exp_roundtrip(rng):
    tau = rng.normal(size=6).astype(np.float32) * 0.5
    T = np.asarray(lie.se3_exp(jnp.asarray(tau)))
    # exp(tau) @ exp(-tau) == I is NOT true for se(3) in general unless
    # same axis; instead check against scipy via the adjoint-free formula:
    theta = tau[3:]
    R_ref = Rotation.from_rotvec(theta).as_matrix()
    np.testing.assert_allclose(T[:3, :3], R_ref, atol=5e-4)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=0)
    # V(theta) @ rho
    a = np.linalg.norm(theta)
    W = np.asarray(lie.skew(jnp.asarray(theta)))
    V = (
        np.eye(3)
        + (1 - np.cos(a)) / a**2 * W
        + (a - np.sin(a)) / a**3 * (W @ W)
    )
    np.testing.assert_allclose(T[:3, 3], V @ tau[:3], atol=5e-4)


def test_se3_exp_grad_no_nan_at_zero():
    g = jax.jacfwd(lie.se3_exp)(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(g)))
    # d(exp tau)/d rho at 0 is identity in the translation block
    g = np.asarray(g)
    np.testing.assert_allclose(g[:3, 3, :3], np.eye(3), atol=1e-6)
    # d R / d theta at 0 is the skew generator
    e2 = np.zeros(6); e2[5] = 1.0
    dR = g[:3, :3] @ e2
    np.testing.assert_allclose(dR, np.array([[0, -1, 0], [1, 0, 0], [0, 0, 0]]),
                               atol=1e-6)


def test_update_pose_matches_reference_semantics(rng):
    R0 = Rotation.random(random_state=0).as_matrix().astype(np.float32)
    t0 = rng.normal(size=3).astype(np.float32)
    tau = rng.normal(size=6).astype(np.float32) * 0.01
    R1, t1, conv = lie.update_pose(jnp.asarray(tau), jnp.asarray(R0), jnp.asarray(t0))
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, :3], T0[:3, 3] = R0, t0
    T1 = np.asarray(lie.se3_exp(jnp.asarray(tau))) @ T0
    np.testing.assert_allclose(np.asarray(R1), T1[:3, :3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(t1), T1[:3, 3], atol=1e-5)
    assert not bool(conv)
    _, _, conv0 = lie.update_pose(jnp.zeros(6), jnp.asarray(R0), jnp.asarray(t0))
    assert bool(conv0)


def test_quat_to_rotmat_matches_scipy(rng):
    q = rng.normal(size=(32, 4)).astype(np.float32)
    R = np.asarray(lie.quat_to_rotmat(jnp.asarray(q)))
    # scipy uses (x, y, z, w); ours is (w, x, y, z)
    R_ref = Rotation.from_quat(np.roll(q, -1, axis=1)).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)
