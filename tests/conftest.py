"""Test configuration: force an 8-device virtual CPU mesh before jax import
so multi-chip sharding logic is testable without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This image's sitecustomize imports jax at interpreter startup with the
# axon TPU platform pinned; env vars alone are too late. The config knob
# still works because backends initialize lazily on first use.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # Function-scoped: every test sees the same deterministic stream
    # regardless of which other tests ran (top-k near-ties between the
    # float64 host oracle and the float32 device path make data
    # order-sensitivity a real flake source).
    return np.random.RandomState(0)


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


_ref_cache = {}


def import_reference_module(name: str):
    """Import a module from the read-only upstream reference for use as a
    numerical oracle in parity tests (never copied, only executed).

    Stubs ``pyedflib`` (not installed in this image; only needed by the
    reference's EDF ingest, which the oracle functions don't touch).
    """
    import sys
    import types

    if name in _ref_cache:
        return _ref_cache[name]
    if "pyedflib" not in sys.modules:
        sys.modules["pyedflib"] = types.ModuleType("pyedflib")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import importlib

    mod = importlib.import_module(name)
    _ref_cache[name] = mod
    return mod
