"""Test config: run everything on a virtual 8-device CPU mesh so sharding
tests work (and run fast) without TPU hardware. Must set env before jax
import; PALLAS_AXON_POOL_IPS must be cleared or the axon TPU-tunnel
sitecustomize hijacks the platform regardless of JAX_PLATFORMS."""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# the axon sitecustomize may already have registered the TPU tunnel with
# priority over env selection; force cpu explicitly (works post-register)
jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
