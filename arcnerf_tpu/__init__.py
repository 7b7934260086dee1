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

import os as _os

# Dataset preparation (full-image ray gen, pose math) runs tiny jitted
# programs that cost milliseconds on the host but MINUTES per shape when
# compiled for a remote accelerator (render/camera.py pins them to the
# cpu backend). Restrictive JAX_PLATFORMS values (e.g. "axon" on the
# tunnel, "tpu" on pods) leave no cpu backend registered and the pin
# silently falls back to the accelerator — so append cpu while keeping
# the accelerator first (list order sets the default backend). Must run
# before the first jax backend is initialized; importing arcnerf_tpu
# before touching jax.devices() satisfies that.
_plat = _os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    _os.environ["JAX_PLATFORMS"] = _plat + ",cpu"
del _plat, _os
