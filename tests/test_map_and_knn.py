import jax
import jax.numpy as jnp
import numpy as np

from gs_slam_analytica_jacobian_tpu.models import gaussian_map as gmap
from gs_slam_analytica_jacobian_tpu.ops import knn


def test_knn_exact_matches_bruteforce(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    out = np.asarray(knn.mean_sq_dist_3nn_exact(jnp.asarray(pts)))
    d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    ref = np.sort(d, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(out, ref, rtol=1e-4)


def test_knn_morton_close_to_exact(rng):
    # locality-coherent cloud (like backprojected depth)
    g = np.stack(np.meshgrid(np.linspace(0, 1, 30), np.linspace(0, 1, 30)),
                 -1).reshape(-1, 2)
    pts = np.concatenate(
        [g, 0.05 * rng.normal(size=(len(g), 1))], 1).astype(np.float32)
    exact = np.asarray(knn.mean_sq_dist_3nn_exact(jnp.asarray(pts)))
    approx = np.asarray(knn.mean_sq_dist_3nn_morton(jnp.asarray(pts), window=64))
    # The windowed search is an over-approximation (like the CUDA original's
    # candidate pruning): never below exact, and close for most points.
    assert np.all(approx >= exact - 1e-6)
    rel = (approx - exact) / np.maximum(exact, 1e-9)
    assert np.median(rel) < 0.05
    assert np.mean(np.isclose(exact, approx, rtol=1e-3)) > 0.35


def make_map(n=10, cap=32, rng=None):
    gm = gmap.GaussianMap.empty(cap, max_sh_degree=0)
    block = gmap.ParamBlock(
        xyz=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        features_dc=jnp.asarray(rng.normal(size=(n, 1, 3)), jnp.float32),
        features_rest=jnp.zeros((n, 0, 3)),
        scaling=jnp.full((n, 3), -2.0),
        rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1)),
        opacity=jnp.zeros((n, 1)),
        kf_id=jnp.zeros((n,), jnp.int32),
        valid=jnp.ones((n,), bool),
    )
    st = gmap.adam_init(gm)
    gm, st, ov = gmap.extend(gm, st, block)
    assert int(ov) == 0
    return gm, st, block


def test_extend_and_prune(rng):
    gm, st, block = make_map(rng=rng)
    assert int(gm.num_active()) == 10
    # extend again
    gm2, st2, ov = gmap.extend(gm, st, block)
    assert int(gm2.num_active()) == 20
    assert int(ov) == 0
    # overflow
    gm3, st3, ov = gmap.extend(gm2, st2, block)
    assert int(gm3.num_active()) == 30
    gm4, _, ov = gmap.extend(gm3, st3, block)
    assert int(gm4.num_active()) == 32
    assert int(ov) == 8
    # prune
    mask = jnp.arange(32) < 5
    gm5, _ = gmap.prune(gm3, st3, mask)
    assert int(gm5.num_active()) == 25


def test_extend_preserves_values(rng):
    gm, st, block = make_map(rng=rng)
    active_idx = np.where(np.asarray(gm.active))[0]
    got = np.asarray(gm.xyz[active_idx])
    want = np.asarray(block.xyz)
    # rows placed in candidate order into free slots 0..9
    np.testing.assert_allclose(np.sort(got.ravel()), np.sort(want.ravel()))


def test_adam_matches_torch_semantics(rng):
    import torch

    gm, st, _ = make_map(rng=rng)
    g = {f: jnp.asarray(rng.normal(size=getattr(gm, f).shape), jnp.float32)
         for f in gmap.PARAM_FIELDS}
    lrs = {f: jnp.asarray(0.01) for f in gmap.PARAM_FIELDS}

    t_param = torch.nn.Parameter(
        torch.from_numpy(np.asarray(gm.xyz)).clone())
    opt = torch.optim.Adam([t_param], lr=0.01, eps=1e-15)

    gm_j, st_j = gm, st
    for _ in range(5):
        gm_j, st_j = gmap.adam_update(gm_j, g, st_j, lrs)
        opt.zero_grad()
        t_param.grad = torch.from_numpy(np.asarray(g["xyz"]))
        opt.step()

    # (f32 op-order differences: torch does sqrt(v)/sqrt(bc2), we fold them)
    np.testing.assert_allclose(
        np.asarray(gm_j.xyz), t_param.detach().numpy(), rtol=2e-3, atol=1e-5)


def test_densify_and_prune_runs(rng):
    gm, st, _ = make_map(n=10, cap=64, rng=rng)
    # make some gaussians have high grad stats
    gm = gm.replace(
        xyz_grad_accum=jnp.where(gm.active, 1.0, 0.0),
        denom=jnp.where(gm.active, 1.0, 0.0),
        opacity=jnp.where(gm.active[:, None], 2.0, 0.0),  # sigmoid ~ 0.88
    )
    key = jax.random.PRNGKey(0)
    gm2, st2, ov = gmap.densify_and_prune(
        gm, st, key, max_grad=0.5, min_opacity=0.005, extent=1.0,
        max_screen_size=None, percent_dense=0.01)
    # all 10 had large scale (exp(-2)=0.135 > 0.01*1.0) -> split into 2 kids
    assert int(gm2.num_active()) == 20
    assert int(ov) == 0
    # scales shrunk by 1/(0.8*2)
    act = np.asarray(gm2.active)
    np.testing.assert_allclose(
        np.asarray(gm2.scaling)[act],
        np.log(np.exp(-2.0) / 1.6), rtol=1e-5)


def test_opacity_reset(rng):
    gm, st, _ = make_map(rng=rng)
    gm2, st2 = gmap.reset_opacity(gm, st, 0.01)
    act = np.asarray(gm2.active)
    op = np.asarray(gm2.get_opacity())[act]
    np.testing.assert_allclose(op, 0.01, rtol=1e-4)
