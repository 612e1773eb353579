"""Test config: run everything on CPU with 8 virtual XLA devices.

The standard JAX fake-backend trick for exercising pjit/shard_map mesh
code without TPU hardware (SURVEY.md §4).  Must run before jax imports.
"""
import os

# NOTE: this environment's sitecustomize imports jax at interpreter
# startup and registers the remote-TPU ("axon") backend, so env vars set
# here are too late — jax.config.update after import is what actually
# forces the local CPU backend for tests.
os.environ["JAX_PLATFORMS"] = "cpu"
# the suite must be hermetic: never attempt the first-use weight
# download (tests that exercise the fetch chain point it at a local
# HTTP fixture and clear this)
os.environ["EGREGORA_TPU_OFFLINE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA:CPU compile cache (same workspace dir the multichip
# dryrun uses): the suite is compile-dominated on this 1-core box, and
# most tests re-jit the same tiny programs every session.  Keyed by HLO
# hash + flags, so geometry changes recompile as usual.
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture()
def sine48k():
    sr = 48000
    t = np.arange(sr * 2) / sr
    x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    return x[None, :], sr
