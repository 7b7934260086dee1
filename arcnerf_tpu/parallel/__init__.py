"""Parallelism: device mesh + sharding helpers (replaces the reference's
torch.distributed/DDP/NCCL stack — SURVEY.md section 2.11)."""

from .mesh import get_mesh, shard_batch, replicate  # noqa: F401
