"""Loss-library unit tests: Scharr gradients, depth_reg, mark_visible.

depth_reg is validated against an independent numpy re-derivation of the
reference semantics (utils/slam_utils.py:41-53): Scharr gradients with
reflect padding, 3x3-all-valid masks, exp(-10*gray_grad^2) weights,
masked means summed over the two directions.
"""

import numpy as np
import jax.numpy as jnp

from gs_slam_analytica_jacobian_tpu.ops import losses
from gs_slam_analytica_jacobian_tpu.slam.render_api import mark_visible


def _np_conv3x3_reflect(img, k):
    """img: (H, W), k: (3, 3) correlation kernel, reflect padding."""
    H, W = img.shape
    p = np.pad(img, 1, mode="reflect")
    out = np.zeros_like(img)
    for dy in range(3):
        for dx in range(3):
            out += k[dy, dx] * p[dy:dy + H, dx:dx + W]
    return out


def _np_scharr(img):
    conv_y = np.array([[3.0, 0, -3], [10, 0, -10], [3, 0, -3]])
    conv_x = np.array([[3.0, 10, 3], [0, 0, 0], [-3, -10, -3]])
    norm = 1.0 / np.abs(conv_y).sum()
    grad_v = norm * _np_conv3x3_reflect(img, conv_x)
    grad_h = norm * _np_conv3x3_reflect(img, conv_y)
    return grad_v, grad_h


def test_image_gradient_matches_numpy(rng):
    img = rng.uniform(size=(1, 12, 17)).astype(np.float32)
    gv, gh = losses.image_gradient(jnp.asarray(img))
    ev, eh = _np_scharr(img[0])
    np.testing.assert_allclose(np.asarray(gv[0]), ev, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh[0]), eh, atol=1e-5)


def test_depth_reg_matches_reference_semantics(rng):
    H, W = 14, 19
    depth = rng.uniform(0.5, 3.0, size=(1, H, W)).astype(np.float32)
    # carve some invalid (near-zero) depth so the 3x3 mask is nontrivial
    depth[0, 3:6, 4:9] = 0.0
    gt = rng.uniform(size=(3, H, W)).astype(np.float32)

    got = float(losses.depth_reg(jnp.asarray(depth), jnp.asarray(gt)))

    # independent numpy re-derivation
    valid = (np.abs(depth[0]) > 0.01).astype(np.float32)
    m = _np_conv3x3_reflect(valid, np.ones((3, 3))) == 9.0
    gray = gt.mean(axis=0)
    ggv, ggh = _np_scharr(gray)
    dgv, dgh = _np_scharr(depth[0])
    w_v = np.exp(-10 * ggv[m] ** 2)
    w_h = np.exp(-10 * ggh[m] ** 2)
    want = ((w_h * np.abs(dgh[m])).mean()
            + (w_v * np.abs(dgv[m])).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert np.isfinite(got) and got > 0


def test_depth_reg_smooth_depth_is_near_zero():
    depth = jnp.full((1, 16, 16), 2.0)
    gt = jnp.zeros((3, 16, 16))
    assert float(losses.depth_reg(depth, gt)) < 1e-6


def test_mark_visible_near_plane(rng):
    # camera at origin looking down +z (identity w2c)
    w2c = jnp.eye(4)
    pts = np.array([[0.0, 0.0, 1.0],     # in front
                    [0.0, 0.0, 0.25],    # just in front of near plane
                    [0.0, 0.0, 0.1],     # inside near plane -> culled
                    [0.0, 0.0, -2.0]],   # behind
                   np.float32)
    vis = np.asarray(mark_visible(jnp.asarray(pts), w2c))
    np.testing.assert_array_equal(vis, [True, True, False, False])

    # translated/rotated camera: agree with explicit p_view.z > 0.2
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    t = np.array([0.3, -0.2, 0.5], np.float32)
    w2c2 = np.eye(4, dtype=np.float32)
    w2c2[:3, :3] = R
    w2c2[:3, 3] = t
    pts2 = rng.standard_normal((64, 3)).astype(np.float32)
    want = (pts2 @ R.T + t)[:, 2] > 0.2
    got = np.asarray(mark_visible(jnp.asarray(pts2), jnp.asarray(w2c2)))
    np.testing.assert_array_equal(got, want)
