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

# Persistent XLA compilation cache: the fast tier is compile-bound on this
# 1-core host (tiny test shapes, large traced graphs). Caching compiled
# executables across runs cuts the suite several-fold after the first run;
# correctness is unaffected (cache keys cover HLO + jaxlib + flags).
_cache_dir = os.environ.get("ARCNERF_TEST_CACHE", "/root/.cache/arcnerf_jax_tests")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:  # older jaxlib without the knobs: cache is best-effort
    pass
