"""Keccak-AIR proving benchmark (BASELINE config 4 at scale).

    python scripts/keccak_bench.py [n_perms]   # default 10 (trace 2^8 x 2633)

Measured on one v5e chip (2026-08-16): trace gen 0.1s, first prove 232s
(module compilation, cached thereafter), steady-state re-prove 3.8s,
verifies on the JAX path.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from plonky25_tpu.models.keccak_air import KeccakAir, NUM_KECCAK_COLS, keccak_trace
from plonky25_tpu.proof import FriConfig
from plonky25_tpu.prover import prove_on_device
from plonky25_tpu.verifier import verify_proof


def main():
    n_perms = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rng = random.Random(3)
    inputs = [[rng.randrange(1 << 64) for _ in range(25)] for _ in range(n_perms)]
    height = 1
    while height < n_perms * 24:
        height *= 2

    t0 = time.time()
    rows = keccak_trace(inputs, min_height=height)
    print(f"trace gen ({len(rows)}x{NUM_KECCAK_COLS}): {time.time() - t0:.1f}s")

    fc = FriConfig(log_blowup=1, num_queries=64, proof_of_work_bits=8)
    air = KeccakAir()
    t0 = time.time()
    prove_on_device(air, rows, fc)
    print(f"first prove (incl. compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    proof = prove_on_device(air, rows, fc)
    dt = time.time() - t0
    print(f"re-prove: {dt:.2f}s ({n_perms / dt:.1f} keccak-f permutations proved/s)")
    print("verifies:", bool(np.asarray(verify_proof(proof, air, fc).ok)))


if __name__ == "__main__":
    main()
