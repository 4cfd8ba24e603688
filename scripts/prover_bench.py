"""Prover throughput benchmark (steady-state, shape-warmed).

    python scripts/prover_bench.py [log_n ...]   # default: 10 12

Reports per trace height: first-proof wall clock (includes concurrent
module compilation), steady-state re-prove latency, and trace cells/s.
The proof is checked against the TPU verifier each run.
"""

import os
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

from plonky25_tpu.models.fibonacci import FibonacciAir, fibonacci_trace
from plonky25_tpu.proof import FriConfig
from plonky25_tpu.prover import prove_on_device
from plonky25_tpu.verifier import verify_proof

FC = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)


def _peak_hbm():
    """Peak device-memory bytes if the backend exposes memory_stats."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use")
    except Exception:
        return None


def main():
    log_ns = [int(a) for a in sys.argv[1:]] or [10, 12]
    air = FibonacciAir()
    for log_n in log_ns:
        trace = fibonacci_trace(1 << log_n)
        t0 = time.time()
        prove_on_device(air, trace, FC)
        first = time.time() - t0

        reps = 3
        t0 = time.time()
        for _ in range(reps):
            proof = prove_on_device(air, trace, FC)
        steady = (time.time() - t0) / reps
        peak = _peak_hbm()

        ok = bool(np.asarray(verify_proof(proof, air, FC).ok))
        cells = (1 << log_n) * air.width()
        mem = f", peak HBM {peak / 2**30:.2f} GiB" if peak else ""
        print(f"fib 2^{log_n}: first {first:.1f}s, steady {steady:.2f}s, "
              f"{cells / steady:,.0f} trace cells/s, verifies={ok}{mem}")


if __name__ == "__main__":
    main()
