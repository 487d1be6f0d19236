"""Test harness: run everything on a virtual 8-device CPU backend so sharded
code paths are exercised without TPU hardware, and pin matmul precision to
float32 so parity checks against numpy/torch oracles are meaningful."""

import os

# Force the virtual-CPU backend: the base image exports JAX_PLATFORMS=axon
# and a sitecustomize that registers the TPU plugin whenever
# PALLAS_AXON_POOL_IPS is set, so plain setdefault is not enough.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "float32"
# persistent compile cache: recompiles across test processes are the
# dominant cost on this single-core host
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
