"""Rendering-metric sanity: the weight-free LPIPS proxy
(utils/eval.py lpips_proxy — fills the perceptual column the reference
computes with trained LPIPS(alex), eval_utils.py:137-160, which needs
pretrained weights unavailable in a zero-egress environment)."""

import numpy as np

from gs_slam_analytica_jacobian_tpu.utils.eval import lpips_proxy


def _img(rng, H=64, W=64):
    return rng.uniform(size=(3, H, W)).astype(np.float32)


def test_lpips_proxy_zero_on_identical(rng):
    a = _img(rng)
    assert lpips_proxy(a, a) == 0.0


def test_lpips_proxy_orders_distortions(rng):
    """More distortion -> larger distance; structural scrambling beats
    small noise (the property that makes it perceptual-ish)."""
    a = _img(rng)
    small = np.clip(a + rng.normal(0, 0.01, a.shape), 0, 1).astype(
        np.float32)
    big = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
    perm = rng.permutation(a.shape[1])
    scrambled = a[:, perm, :]
    d_small = lpips_proxy(a, small)
    d_big = lpips_proxy(a, big)
    d_scram = lpips_proxy(a, scrambled)
    assert 0 < d_small < d_big < d_scram
    # and it is deterministic (fixed-seed weights)
    assert lpips_proxy(a, big) == d_big


def test_lpips_proxy_symmetric(rng):
    a, b = _img(rng), _img(rng)
    assert abs(lpips_proxy(a, b) - lpips_proxy(b, a)) < 1e-6
