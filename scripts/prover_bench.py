"""Prover throughput benchmark (steady-state, shape-warmed).

    python scripts/prover_bench.py [--mesh] [log_n ...]
    # default sizes: 10 12 15 18 20 (BASELINE config 2's promised range)

Reports per trace height: first-proof wall clock (includes concurrent
module compilation), steady-state re-prove latency, trace cells/s, and
peak HBM.  The proof is checked against the TPU verifier each run.
--mesh routes the trace LDE through the mesh-sharded four-step NTT
(TpuProver(lde_mesh=...)) over all local devices; on one chip this is
the sharded code path at shard-count 1 (correctness/overhead probe, not
a scaling claim)."""

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
    argv = sys.argv[1:]
    use_mesh = "--mesh" in argv
    argv = [a for a in argv if a != "--mesh"]
    log_ns = [int(a) for a in argv] or [10, 12, 15, 18, 20]
    air = FibonacciAir()
    mesh = None
    if use_mesh:
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()), ("lde",))
    for log_n in log_ns:
        trace = fibonacci_trace(1 << log_n)
        prover = None
        if mesh is not None:
            from plonky25_tpu.prover.prove import TpuProver
            prover = TpuProver(air, log_n, FC, lde_mesh=mesh)

        def prove(t=trace, p=prover):
            if p is not None:
                return p.prove(t)
            return prove_on_device(air, t, FC)

        t0 = time.time()
        prove()
        first = time.time() - t0

        reps = 3 if log_n <= 16 else 2
        t0 = time.time()
        for _ in range(reps):
            proof = prove()
        steady = (time.time() - t0) / reps
        peak = _peak_hbm()

        ok = bool(np.asarray(verify_proof(proof, air, FC).ok))
        cells = (1 << log_n) * air.width()
        mem = f", peak HBM {peak / 2**30:.2f} GiB" if peak else ""
        print(f"fib 2^{log_n}: first {first:.1f}s, steady {steady:.2f}s, "
              f"{cells / steady:,.0f} trace cells/s, verifies={ok}{mem}")


if __name__ == "__main__":
    main()
