"""Model-parallel splat compositing: shard the GAUSSIAN axis by depth slab.

The reference is single-GPU; its scale limit is the map size (every CUDA
kernel touches all gaussians, rasterizer_impl.cu:198-391). The TPU-native
scale-out for the MAP axis exploits that front-to-back alpha compositing is
the associative "over" operator on (premultiplied color, transmittance):

    (C_a, T_a) OVER (C_b, T_b) = (C_a + T_a * C_b,  T_a * T_b)

so gaussians can be partitioned into DEPTH-CONTIGUOUS slabs, one per
device: each device composites only its own slab (its parameters never
leave the chip), and the per-pixel slab images are combined with an
exclusive-prefix-product over the model axis — one all_gather of image-
sized tensors over ICI instead of any gaussian-sized collective. Gradients
flow through the combine by JAX AD, so each device receives gradients for
exactly its own slab's parameters: memory AND compute for the map scale
linearly with devices.

Semantics note: the reference kernel terminates a pixel when the GLOBAL
transmittance would drop below 1e-4 (forward.cu:478-520). A slab cannot
see upstream slabs' transmittance, so contributions that the reference
would cut are instead included with weight T_upstream * w < 1e-4 —
a <=1e-4 absolute deviation at slab boundaries, below fp32 rendering
noise. (The per-slab compositing itself applies the full reference
semantics locally.)

Per-slab compositing runs either the jnp oracle (ops/renderer_ref, the
clarity path) or the production tiled Pallas renderer
(ops/renderer_tiled, ``tiled=True`` — interpret mode on CPU meshes): the
slab partition and the OVER-combine are identical, so both paths are
exercised by the multi-chip tests and the dryrun.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import jax.nn

from ..models.camera import Camera
from ..models.gaussian_map import GaussianMap, PARAM_FIELDS, build_cov3d
from ..ops import renderer_ref, renderer_tiled
from ..ops import losses


def _render_slab(params_sh, active_sh, gm: GaussianMap, cam: Camera,
                 tiled: bool = False, pair_capacity: int = 1 << 16,
                 interpret: bool = False):
    """Render one depth slab from raw (sharded) parameter arrays;
    returns the PRE-background (color_sum, depth_sum, final_T)."""
    cov6 = build_cov3d(jnp.exp(params_sh["scaling"]), params_sh["rotation"])
    opac = jax.nn.sigmoid(params_sh["opacity"])[:, 0]
    feats = jnp.concatenate(
        [params_sh["features_dc"], params_sh["features_rest"]], axis=1)
    render_fn = renderer_tiled.render if tiled else renderer_ref.render
    kw = (dict(pair_capacity=pair_capacity, interpret=interpret,
               need_n_touched=False) if tiled else {})
    out = render_fn(
        params_sh["xyz"], cov6, opac, feats, gm.active_sh_degree,
        cam.w2c(), cam.projection(), jnp.zeros((6,), jnp.float32),
        cam.fx, cam.fy, cam.width, cam.height,
        cam.tanfovx, cam.tanfovy, jnp.zeros((3,)),
        active=active_sh, **kw)
    return out.color, out.depth[0], out.final_T


def _combine_slabs(c_slab, d_slab, t_slab, bg, axis):
    """Associative OVER-combine of per-device slab images: one image-sized
    all_gather over ICI, then the exclusive transmittance prefix."""
    cs = jax.lax.all_gather(c_slab, axis)                # (P, 3, H, W)
    ds = jax.lax.all_gather(d_slab, axis)                # (P, H, W)
    ts = jax.lax.all_gather(t_slab, axis)                # (P, H, W)
    t_excl = jnp.concatenate(
        [jnp.ones_like(ts[:1]), jnp.cumprod(ts, axis=0)[:-1]], axis=0)
    color = jnp.sum(t_excl[:, None] * cs, axis=0)
    depth = jnp.sum(t_excl * ds, axis=0)
    T_fin = jnp.prod(ts, axis=0)
    color = color + T_fin[None] * bg[:, None, None]
    return color, depth[None], 1.0 - T_fin[None]


def depth_slab_order(gm: GaussianMap, cam: Camera) -> jnp.ndarray:
    """Permutation placing active gaussians in global front-to-back depth
    order (inactive ones pushed to the back) — the slab partition key."""
    p_view_z = gm.xyz @ cam.R[2] + cam.t[2]
    key = jnp.where(gm.active, p_view_z, jnp.inf)
    return jnp.argsort(key)


def slab_render(
    mesh: Mesh,
    gm: GaussianMap,
    cam: Camera,
    bg: jnp.ndarray,
    axis: str = "data",
    tiled: bool = False,
    pair_capacity: int = 1 << 16,
    interpret: bool = False,
):
    """Render with the gaussian axis sharded into depth slabs over
    ``mesh``. Returns (color, depth, opacity) replicated on every device.

    Differentiable w.r.t. all gaussian parameters; each device's gradient
    touches only its own slab. ``tiled=True`` composites each slab with
    the production Pallas renderer (pass ``interpret=True`` on CPU
    meshes); the default is the jnp oracle.
    """
    order = depth_slab_order(gm, cam)
    params = {f: getattr(gm, f)[order] for f in PARAM_FIELDS}
    active = gm.active[order]
    n_dev = mesh.shape[axis]
    C = gm.capacity
    assert C % n_dev == 0, (C, n_dev)

    def local(params_sh, active_sh):
        c_slab, d_slab, t_slab = _render_slab(
            params_sh, active_sh, gm, cam, tiled, pair_capacity, interpret)
        return _combine_slabs(c_slab, d_slab, t_slab, bg, axis)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=({f: P(axis) for f in PARAM_FIELDS}, P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(params, active)


def slab_mapping_loss_and_grads(
    mesh: Mesh,
    gm: GaussianMap,
    cam: Camera,
    gt_image: jnp.ndarray,
    gt_depth: jnp.ndarray,
    bg: jnp.ndarray,
    rgb_boundary_threshold: float = 0.01,
    alpha: float = 0.95,
    axis: str = "data",
    tiled: bool = False,
    pair_capacity: int = 1 << 16,
    interpret: bool = False,
):
    """Mapping loss + per-parameter gradients with the map model-parallel
    over depth slabs. Gradients come back in the ORIGINAL gaussian order
    (the slab permutation is inverted), so they drop into the standard
    adam_update. Nothing gaussian-sized crosses ICI — only image-sized
    slab composites. ``tiled=True`` runs the Pallas renderer per slab."""
    order = depth_slab_order(gm, cam)
    inv = jnp.argsort(order)

    active_o = gm.active[order]

    def loss_fn(params_ordered):
        n_dev = mesh.shape[axis]
        assert gm.capacity % n_dev == 0

        def local(params_sh, active_sh):
            c_slab, d_slab, t_slab = _render_slab(
                params_sh, active_sh, gm, cam, tiled, pair_capacity,
                interpret)
            color, depth, _ = _combine_slabs(
                c_slab, d_slab, t_slab, bg, axis)
            return losses.loss_mapping_rgbd(
                color, depth, gt_image, gt_depth, rgb_boundary_threshold,
                alpha)

        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=({f: P(axis) for f in PARAM_FIELDS}, P(axis)),
            out_specs=P(),
            check_vma=False,
        )
        return fn(params_ordered, active_o)

    params_ordered = {f: getattr(gm, f)[order] for f in PARAM_FIELDS}
    loss, grads_o = jax.jit(jax.value_and_grad(loss_fn))(params_ordered)
    grads = {f: grads_o[f][inv] for f in PARAM_FIELDS}
    return loss, grads
