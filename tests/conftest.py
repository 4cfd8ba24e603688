"""Test configuration: force the CPU backend with 8 virtual devices.

Sharding tests run on a virtual 8-device CPU mesh (SURVEY.md §4: the
multi-node substitute); kernels are identical to the TPU path.  Note the
axon TPU plugin ignores the JAX_PLATFORMS env var, so we must force the
platform through jax.config before any backend initialization.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: verifier graphs are nontrivial to compile;
# cache across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import random  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


ARTIFACT = "/root/reference/artifacts/proof_fibonacci.json"


@pytest.fixture(scope="session")
def golden_proof():
    from plonky25_tpu.proof import load_proof

    return load_proof(ARTIFACT)
