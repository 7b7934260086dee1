"""arcnerf_tpu: a TPU-native NeRF framework (JAX / XLA / Pallas).

Re-implements the capabilities of the ArcNerf reference framework
(TencentARC/ArcNerf) with a TPU-first architecture:

- compute path: jax.numpy + Pallas kernels (fused hashgrid+MLP, occupancy
  DDA sampling) instead of CUDA extensions / tiny-cuda-nn,
- static shapes + validity masks instead of data-dependent control flow,
- sharding via ``jax.sharding.Mesh`` + ``jax.jit`` instead of DDP/NCCL,
- functional train state (params, optimizer, occupancy buffers) instead of
  in-place module mutation.

Layer map mirrors the reference (see SURVEY.md section 1):
utils -> geometry -> render -> ops -> models -> datasets -> trainer -> eval.
"""

__version__ = "0.1.0"
