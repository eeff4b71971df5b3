"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding logic is validated on a virtual CPU mesh (SURVEY.md §4);
benchmarks run separately on real TPU hardware via bench.py.
"""
import os

# Force override: the ambient environment pins JAX_PLATFORMS=axon (a
# single-chip TPU tunnel); tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

from pathnet_tpu.utils import enable_compilation_cache

enable_compilation_cache()

# This platform's default matmul precision is bf16-grade even on the CPU
# backend (observed ~8e-2 abs error on a 64x64 f32 matmul); golden-parity
# tests need true f32 accumulation.
import jax

jax.config.update("jax_default_matmul_precision", "float32")
# Plugins (jaxtyping) import jax before this conftest, locking jax_platforms
# from the ambient env (axon) — override through the config API, which works
# any time before first backend initialization.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def cornell_graph():
    from pathnet_tpu.data import Graph
    return Graph.from_edge_input(
        os.path.join(os.path.dirname(__file__), "..", "data", "edge_input", "cornell.in"),
        name="cornell")


@pytest.fixture(scope="session")
def small_graph():
    """Deterministic 60-node synthetic graph with MERW probs attached."""
    from pathnet_tpu.data import synthetic_graph
    from pathnet_tpu.merw import merw_graph
    g = synthetic_graph(n=60, avg_deg=5, num_classes=3, homophily=0.6,
                        feat_dim=16, seed=7)
    return merw_graph(g)
