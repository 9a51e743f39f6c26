"""gs_slam_analytica_jacobian_tpu — TPU-native Gaussian-Splatting SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
notu97/GS-SLAM-Analytica_Jacobian (a MonoGS fork with analytical se(3)
pose-Jacobian verification):

- ``ops``      — differentiable splat renderer (jnp oracle + Pallas tiled
                 production path), SE(3)/SO(3) Lie algebra, spherical
                 harmonics, EWA projection, k-NN scale init, losses, and the
                 analytical dL/dtau Jacobian lab.
- ``models``   — fixed-capacity GaussianMap pytree (densify/prune as masked
                 compaction) and Camera pytrees.
- ``parallel`` — host-thread frontend/backend pipeline (the reference's
                 torch.multiprocessing queues become queue.Queue between
                 threads; jax arrays are immutable so map snapshots are free)
                 and jax.sharding multi-chip mapping.
- ``slam``     — tracking frontend, mapping backend, SLAM driver.
- ``utils``    — config (YAML inherit_from), datasets (Replica/TUM/EuRoC),
                 eval (ATE/PSNR/SSIM), PLY io, logging.

Design stance (TPU-first, not a CUDA translation):
- Everything on the compute path is jit-able with static shapes.
- The camera pose enters the renderer as T(tau) = Exp(tau) @ T_base, so
  jax.grad at tau=0 produces the same dL/dtau that the reference's
  hand-written CUDA backward computes (diff-gaussian-rasterization
  backward.cu:150-624).
- Alpha compositing is expressed as masked cumulative products + matmuls so
  the MXU does the blending; early-termination becomes masking instead of
  warp divergence.
"""

__version__ = "0.1.0"

import jax as _jax

# Gradient parity with the fp32 CUDA reference requires true-f32 matmuls
# (TPU defaults f32 matmuls to bf16 passes). The hot compositing kernels
# opt into their own precision explicitly (preferred_element_type), so this
# only affects the small pose/projection algebra and the oracle renderer.
# (SURVEY.md section 7: "force float32 matmuls for gradient parity".)
_jax.config.update("jax_default_matmul_precision", "float32")
