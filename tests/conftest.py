"""Test harness: run everything on a virtual 8-device CPU backend so sharded
code paths are exercised without TPU hardware, and pin matmul precision to
float32 so parity checks against numpy/torch oracles are meaningful.

The base image's sitecustomize imports jax at interpreter start (registering
the axon TPU plugin and freezing JAX_PLATFORMS=axon), so env vars set here
are too late — we must go through jax.config.update instead.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "float32")
