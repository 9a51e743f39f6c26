import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gm
from gs_slam_analytica_jacobian_tpu.ops import camera_math as cm
from gs_slam_analytica_jacobian_tpu.ops import sh as sh_ops


def random_scene(rng, n=8):
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    means[:, 2] += 3.0  # in front of camera
    scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 2.0)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = 1 / (1 + np.exp(-rng.normal(size=n).astype(np.float32)))
    shs = rng.normal(size=(n, 16, 3)).astype(np.float32) * 0.3
    return means, scales, quats, opac, shs


def make_cam():
    fx = fy = 300.0
    cx, cy = 159.5, 119.5
    W, H = 320, 240
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, 3] = [0.05, -0.02, 0.1]
    w2c[:3, :3] = Rotation.from_rotvec([0.03, -0.05, 0.02]).as_matrix()
    proj = cm.projection_matrix(0.01, 100.0, cx, cy, fx, fy, W, H)
    return w2c, proj, fx, fy, cx, cy, W, H


def test_cov3d_is_RSSR(rng):
    means, scales, quats, _, _ = random_scene(rng)
    cov6 = np.asarray(gm.build_cov3d(jnp.asarray(scales), jnp.asarray(quats)))
    for i in range(len(scales)):
        R = Rotation.from_quat(np.roll(quats[i], -1)).as_matrix()
        S = np.diag(scales[i])
        Sig = R @ S @ S @ R.T
        ref = np.array([Sig[0, 0], Sig[0, 1], Sig[0, 2],
                        Sig[1, 1], Sig[1, 2], Sig[2, 2]])
        np.testing.assert_allclose(cov6[i], ref, rtol=1e-4, atol=1e-6)


def test_cov2d_matches_numpy_pipeline(rng):
    """Mirror of the reference's NumPy compute_cov2d
    (Loss_Derivative_script_compare.py:772-848)."""
    means, scales, quats, _, _ = random_scene(rng)
    w2c, proj, fx, fy, cx, cy, W, H = make_cam()
    tanfovx, tanfovy = W / (2 * fx), H / (2 * fy)

    cov6 = gm.build_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    p_view = jnp.asarray(means) @ jnp.asarray(w2c[:3, :3]).T + jnp.asarray(w2c[:3, 3])
    a, b, c = gm.compute_cov2d(p_view, cov6, jnp.asarray(w2c[:3, :3]),
                               fx, fy, tanfovx, tanfovy)

    cov6_np = np.asarray(cov6)
    for i in range(len(means)):
        t = w2c[:3, :3] @ means[i] + w2c[:3, 3]
        limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
        tx = np.clip(t[0] / t[2], -limx, limx) * t[2]
        ty = np.clip(t[1] / t[2], -limy, limy) * t[2]
        J = np.array([
            [fx / t[2], 0, -fx * tx / t[2] ** 2],
            [0, fy / t[2], -fy * ty / t[2] ** 2],
            [0, 0, 0],
        ])
        T = J @ w2c[:3, :3]
        V = np.array([
            [cov6_np[i, 0], cov6_np[i, 1], cov6_np[i, 2]],
            [cov6_np[i, 1], cov6_np[i, 3], cov6_np[i, 4]],
            [cov6_np[i, 2], cov6_np[i, 4], cov6_np[i, 5]],
        ])
        C = T @ V @ T.T
        np.testing.assert_allclose(float(a[i]), C[0, 0] + 0.3, rtol=1e-4)
        np.testing.assert_allclose(float(b[i]), C[0, 1], rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(float(c[i]), C[1, 1] + 0.3, rtol=1e-4)


def test_preprocess_projection(rng):
    means, scales, quats, opac, shs = random_scene(rng)
    w2c, proj, fx, fy, cx, cy, W, H = make_cam()
    cov6 = gm.build_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    prep = gm.preprocess(
        jnp.asarray(means), cov6, jnp.asarray(opac), jnp.asarray(shs), 3,
        jnp.asarray(w2c), jnp.asarray(proj), jnp.zeros(6),
        fx, fy, W, H, W / (2 * fx), H / (2 * fy))
    # Pinhole check: the OpenGL proj + ndc2Pix composition reduces to
    # u = fx * x/z + cx - 0.5 (the reference's pixel-center convention:
    # ndc2Pix(v, S) = ((v+1)*S - 1)/2, auxiliary.h:41-44).
    for i in range(len(means)):
        pc = w2c[:3, :3] @ means[i] + w2c[:3, 3]
        u = fx * pc[0] / pc[2] + cx - 0.5
        v = fy * pc[1] / pc[2] + cy - 0.5
        np.testing.assert_allclose(np.asarray(prep.mean2d[i]), [u, v],
                                   rtol=1e-3, atol=0.05)
        np.testing.assert_allclose(float(prep.depth[i]), pc[2], rtol=1e-5)
    assert bool(jnp.all(prep.valid))


def test_preprocess_culls_behind_camera(rng):
    means = np.array([[0.0, 0.0, -1.0], [0.0, 0.0, 3.0]], dtype=np.float32)
    scales = np.full((2, 3), 0.1, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (2, 1))
    w2c, proj, fx, fy, cx, cy, W, H = make_cam()
    w2c = np.eye(4, dtype=np.float32)
    cov6 = gm.build_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    prep = gm.preprocess(
        jnp.asarray(means), cov6, jnp.ones(2), jnp.zeros((2, 16, 3)), 0,
        jnp.asarray(w2c), jnp.asarray(proj), jnp.zeros(6),
        fx, fy, W, H, W / (2 * fx), H / (2 * fy))
    assert not bool(prep.valid[0])
    assert bool(prep.valid[1])
    assert float(prep.radius[0]) == 0.0


def test_sh_color_matches_reference_formula(rng):
    shs = rng.normal(size=(4, 16, 3)).astype(np.float32)
    dirs = rng.normal(size=(4, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    col = np.asarray(sh_ops.sh_to_color(3, jnp.asarray(shs), jnp.asarray(dirs)))
    # brute-force per the CUDA formula (forward.cu:22-73)
    C0, C1 = sh_ops.SH_C0, sh_ops.SH_C1
    C2, C3 = sh_ops.SH_C2, sh_ops.SH_C3
    for i in range(4):
        x, y, z = dirs[i]
        s = shs[i]
        r = C0 * s[0] - C1 * y * s[1] + C1 * z * s[2] - C1 * x * s[3]
        xx, yy, zz, xy, yz, xz = x*x, y*y, z*z, x*y, y*z, x*z
        r = (r + C2[0]*xy*s[4] + C2[1]*yz*s[5] + C2[2]*(2*zz-xx-yy)*s[6]
             + C2[3]*xz*s[7] + C2[4]*(xx-yy)*s[8])
        r = (r + C3[0]*y*(3*xx-yy)*s[9] + C3[1]*xy*z*s[10]
             + C3[2]*y*(4*zz-xx-yy)*s[11] + C3[3]*z*(2*zz-3*xx-3*yy)*s[12]
             + C3[4]*x*(4*zz-xx-yy)*s[13] + C3[5]*z*(xx-yy)*s[14]
             + C3[6]*x*(xx-3*yy)*s[15])
        np.testing.assert_allclose(col[i], np.maximum(r + 0.5, 0.0),
                                   rtol=1e-4, atol=1e-6)


def test_preprocess_grads_finite(rng):
    means, scales, quats, opac, shs = random_scene(rng)
    w2c, proj, fx, fy, cx, cy, W, H = make_cam()

    def f(m, s, q, tau):
        cov6 = gm.build_cov3d(s, q)
        prep = gm.preprocess(
            m, cov6, jnp.asarray(opac), jnp.asarray(shs), 3,
            jnp.asarray(w2c), jnp.asarray(proj), tau,
            fx, fy, W, H, W / (2 * fx), H / (2 * fy))
        return (jnp.sum(prep.mean2d) + jnp.sum(prep.conic)
                + jnp.sum(prep.depth) + jnp.sum(prep.color))

    g = jax.grad(f, argnums=(0, 1, 2, 3))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.zeros(6))
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi)))
