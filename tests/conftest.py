"""Test configuration: force an 8-device virtual CPU mesh.

Tests exercise the same code paths that run on TPU, including shard_map
collectives, on ``xla_force_host_platform_device_count=8`` CPU devices — the
"fake backend" the reference lacks (SURVEY.md §4).  Must run before jax is
imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
m = __import__("re").search(r"--xla_force_host_platform_device_count=(\d+)", flags)
if m is None:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
elif int(m.group(1)) < 8:
    # A smaller pre-existing count (e.g. exported for a dryrun) would make
    # every 8-device-gated test SKIP and the multi-chip suite pass by
    # omission — force at least 8.
    os.environ["XLA_FLAGS"] = flags.replace(
        m.group(0), "--xla_force_host_platform_device_count=8"
    )
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/llp-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image; the
# config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def small_graph():
    """A small random undirected graph + dense adjacency reference."""
    from llp_tpu.core import build_graph
    from llp_tpu.data.synthetic import sbm_graph

    ei, comm = sbm_graph(60, 3, 6.0, seed=1)
    g = build_graph(ei, 60)
    A = np.zeros((60, 60))
    for u, v in ei.T:
        A[v, u] += 1.0
    return g, A, ei, comm
