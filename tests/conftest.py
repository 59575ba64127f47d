"""Test harness config: run on a virtual 8-device CPU mesh.

Real-chip benchmarking happens in bench.py; tests validate semantics
and multi-device sharding on the host platform (the driver separately
dry-runs the multichip path via __graft_entry__.dryrun_multichip).

NOTE: this environment's sitecustomize force-registers the tunneled
'axon' TPU backend and sets jax_platforms='axon,cpu', overriding the
JAX_PLATFORMS env var.  We must override the *config* after importing
jax, before any backend is initialized — otherwise every eager op
round-trips through the TPU tunnel (~0.5s/op) and tests crawl.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles hundreds of small
# jit programs; caching them across runs cuts wall-clock several-fold
# and shrinks the in-process compiler load (one full-suite run
# segfaulted inside XLA:CPU backend_compile after ~100 compilations).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# CLI runs take the dense pregraph path by default: the mesh-resident
# path's routed-primitive compiles dominate on tiny fixtures (it is
# covered explicitly by test_sharded_count / test_sharded_pregraph /
# test_sharded_graph and the driver's dryrun_multichip).
os.environ.setdefault("SOAPDENOVO_TPU_NO_SHARD", "1")
# keep device batches small on the tiny fixtures (the production
# default of 32768 reads/batch just means bigger compiles here)
os.environ.setdefault("SOAPDENOVO_TPU_READ_BATCH", "4096")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
