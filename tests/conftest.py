"""Test env: force CPU with 8 virtual devices so the parallelism layer
(mesh/sharding) is testable without TPU hardware (SURVEY.md §4).

The runtime image pre-imports jax and registers the TPU backend from a
sitecustomize hook before conftest runs, so setting JAX_PLATFORMS in
os.environ is too late — we must update the jax config and clear any
initialized backends instead."""

import os
import sys

# keep transformers torch-only and offline (no TF import, no hub access)
os.environ.setdefault("USE_TF", "0")
os.environ.setdefault("USE_FLAX", "0")
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (may already be imported by sitecustomize)

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge

    xla_bridge._clear_backends()
except Exception:
    pass

assert jax.default_backend() == "cpu", "tests must run on CPU"

# persistent compilation cache: the suite is dominated by XLA CPU compiles.
# Keyed by a host-CPU fingerprint: /tmp can outlive the VM, and XLA:CPU AOT
# entries written on a different host load with mismatched codegen
# ("+prefer-no-scatter not supported..." + ~1e-6 numeric drift that broke a
# bit-parity test in round 5) instead of missing cleanly.
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _flags = next((ln for ln in _f if ln.startswith("flags")), "unknown")
except OSError:
    _flags = "unknown"
_fp = hashlib.sha1(_flags.encode()).hexdigest()[:10]
jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/jax_cache_sliders_tests_{_fp}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
