"""Analytic pose-Jacobian lab vs JAX autodiff (the repo's namesake check).

The reference validates its Eq.3/Eq.4 Jacobians against
torch.autograd.functional (VerifyJacobian.ipynb) and against the CUDA
rasterizer's hand-written backward. Here: jax.jacfwd / jax.grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from gs_slam_analytica_jacobian_tpu.ops import jacobians as jac
from gs_slam_analytica_jacobian_tpu.ops import lie


def setup(rng, n=6):
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    means[:, 2] += 2.5
    A = rng.normal(size=(n, 3, 3)).astype(np.float32) * 0.05
    cov3d = A @ A.transpose(0, 2, 1) + 0.001 * np.eye(3, dtype=np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = Rotation.from_rotvec([0.1, -0.2, 0.15]).as_matrix()
    w2c[:3, 3] = [0.1, 0.2, -0.1]
    return jnp.asarray(means), jnp.asarray(cov3d), jnp.asarray(w2c)


def test_dmu_dtau_matches_autodiff(rng):
    means, cov3d, w2c = setup(rng)

    def mu_I(tau, m):
        w2c_eff = lie.se3_exp(tau) @ w2c
        mu_c = w2c_eff[:3, :3] @ m + w2c_eff[:3, 3]
        return mu_c[:2] / mu_c[2]

    mu_c_all = means @ w2c[:3, :3].T + w2c[:3, 3]
    analytic = jac.dmu_dtau_normalized(mu_c_all)          # (N, 2, 6)
    for i in range(means.shape[0]):
        ad = jax.jacfwd(mu_I)(jnp.zeros(6), means[i])
        np.testing.assert_allclose(np.asarray(analytic[i]), np.asarray(ad),
                                   rtol=1e-4, atol=1e-5)


def test_dsigma_dtau_matches_autodiff(rng):
    means, cov3d, w2c = setup(rng)

    def sigma_I(tau, m, V):
        w2c_eff = lie.se3_exp(tau) @ w2c
        mu_c = w2c_eff[:3, :3] @ m + w2c_eff[:3, 3]
        x, y, z = mu_c
        J = jnp.array([[1 / z, 0.0, -x / z**2], [0.0, 1 / z, -y / z**2]])
        A = J @ w2c_eff[:3, :3]
        return A @ V @ A.T

    mu_c_all = means @ w2c[:3, :3].T + w2c[:3, 3]
    analytic = jac.dSigma_dtau_normalized(w2c[:3, :3], cov3d, mu_c_all)
    for i in range(means.shape[0]):
        ad = jax.jacfwd(sigma_I)(jnp.zeros(6), means[i], cov3d[i])
        np.testing.assert_allclose(np.asarray(analytic[i]), np.asarray(ad),
                                   rtol=2e-3, atol=1e-5)


def test_full_lab_assembly_matches_autodiff(rng):
    """End-to-end: analytic 4-path dL/dtau == jax.grad of the lab forward.

    The lab forward: project means+covs to pixel space with tau-perturbed
    w2c, SH colors through the translation-only campos approximation,
    composite lab-style, masked sign-L1 loss.
    """
    n = 8
    H, W = 24, 32
    fx = fy = 40.0
    means, cov3d, w2c = setup(rng, n)
    opac = jnp.asarray(
        1 / (1 + np.exp(-rng.normal(size=n).astype(np.float32))))
    shs = jnp.asarray(rng.normal(size=(n, 16, 3)).astype(np.float32) * 0.3)
    gt_color = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    gt_depth = jnp.asarray(
        rng.uniform(size=(H, W)).astype(np.float32) * 3 + 0.5)
    mask = jnp.asarray(rng.uniform(size=(H, W)) > 0.3)

    campos0 = -w2c[:3, :3].T @ w2c[:3, 3]
    order = jnp.argsort(means @ w2c[:3, :3].T[:, 2] + w2c[2, 3])

    def project(tau):
        w2c_eff = lie.se3_exp(tau) @ w2c
        mu_c = means @ w2c_eff[:3, :3].T + w2c_eff[:3, 3]     # (N, 3)
        K = jnp.asarray([[fx, 0.0], [0.0, fy]])
        mean2d = (mu_c[:, :2] / mu_c[:, 2:3]) @ K.T + jnp.asarray(
            [(W - 1) / 2, (H - 1) / 2])
        x, y, z = mu_c[:, 0], mu_c[:, 1], mu_c[:, 2]
        zero = jnp.zeros_like(x)
        J = jnp.stack([
            jnp.stack([1 / z, zero, -x / z**2], -1),
            jnp.stack([zero, 1 / z, -y / z**2], -1)], -2)     # (N, 2, 3)
        A = jnp.einsum("nij,jk->nik", J, w2c_eff[:3, :3])
        sig_n = jnp.einsum("nij,njk,nlk->nil", A, cov3d, A)
        sig_pix = sig_n * jnp.asarray([[fx * fx, fx * fy], [fy * fx, fy * fy]])
        depth = mu_c[:, 2]
        # SH path: translation-only campos approximation
        campos_eff = campos0 + tau[:3]
        dirs = means - campos_eff[None]
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-8)
        from gs_slam_analytica_jacobian_tpu.ops import sh as sh_ops
        colors = jnp.maximum(sh_ops.eval_sh(3, shs, dirs) + 0.5, 0.0)
        return mean2d, sig_pix, depth, colors

    def loss(tau):
        mean2d, sig, depth, colors = project(tau)
        C, D = jac.lab_forward_composite(
            mean2d[order], sig[order], colors[order], depth[order],
            opac[order], W, H)
        return (jnp.sum(jnp.abs(C - gt_color) * mask[..., None])
                + jnp.sum(jnp.abs(D - gt_depth) * (mask & (gt_depth > 0))))

    g_ad = np.asarray(jax.grad(loss)(jnp.zeros(6)))

    # Analytic assembly
    mean2d0, sig0, depth0, colors0 = project(jnp.zeros(6))
    C0, D0 = jac.lab_forward_composite(
        mean2d0[order], sig0[order], colors0[order], depth0[order],
        opac[order], W, H)
    grads = jac.lab_gradients(
        mean2d0[order], sig0[order], colors0[order], depth0[order],
        opac[order], C0, D0, gt_color, gt_depth, mask)
    # un-sort gradients back to gaussian order
    inv = jnp.argsort(order)
    grads = jac.LabGrads(grad_mu=grads.grad_mu[inv],
                         grad_sigma=grads.grad_sigma[inv],
                         grad_depth=grads.grad_depth[inv],
                         grad_color=grads.grad_color[inv])

    dmu, dsig = jac.pose_jacobians(means, cov3d, w2c, fx, fy, W, H,
                                   mode="exact")
    # clamp mask for SH path: zero grad where color clamped at 0
    raw_plus = colors0 > 0.0
    gcol = jnp.where(raw_plus, grads.grad_color, 0.0)
    sh_term = jac.sh_viewdir_tau_grad(means, shs, 3, campos0, gcol)
    mu_c_all = means @ w2c[:3, :3].T + w2c[:3, 3]
    total, parts = jac.assemble_dL_dtau(grads, dmu, dsig, mu_c_all, sh_term)

    np.testing.assert_allclose(np.asarray(total), g_ad, rtol=2e-3, atol=2e-3)
