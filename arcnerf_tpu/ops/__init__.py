"""TPU-native ops: custom-vjp math, occupancy sampling, fused kernels.

Replaces the reference CUDA extensions (/root/reference/arcnerf/ops/):
_volume_func, _bitfield_func, _multivol_func, trunc_exp, tiny-cuda-nn.
Everything here is jnp + Pallas; no compiled extension needed.
"""

from .trunc_exp import trunc_exp  # noqa: F401
