"""Keccak-AIR proving benchmark (BASELINE config 4 at scale).

    python scripts/keccak_bench.py [n_perms] [batch]
        # default 170 perms (trace 2^12 x 2633), batch 1

Round-1 state: 10 perms re-proved in 3.8s = 2.6 keccak-f/s/chip
(scalar host trace gen took minutes and the shape was tiny).  Round-2:
vectorized trace gen (keccak_trace_np, ~0.2s for 2^12 rows) and larger
traces amortize the per-proof fixed costs; `batch` > 1 runs same-shape
proofs through the vmapped BatchProver.
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

from plonky25_tpu.models.keccak_air import (
    KeccakAir,
    NUM_KECCAK_COLS,
    keccak_trace_np,
)
from plonky25_tpu.proof import FriConfig
from plonky25_tpu.prover import prove_batch_on_device, prove_on_device
from plonky25_tpu.verifier import verify_proof


def main():
    n_perms = int(sys.argv[1]) if len(sys.argv) > 1 else 170
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rng = random.Random(3)
    inputs = [[rng.randrange(1 << 64) for _ in range(25)]
              for _ in range(n_perms)]

    t0 = time.time()
    rows = keccak_trace_np(inputs)
    print(f"trace gen ({rows.shape[0]}x{NUM_KECCAK_COLS}): "
          f"{time.time() - t0:.2f}s")

    fc = FriConfig(log_blowup=1, num_queries=64, proof_of_work_bits=8)
    air = KeccakAir()

    if batch == 1:
        t0 = time.time()
        prove_on_device(air, rows, fc)
        print(f"first prove (incl. compile): {time.time() - t0:.1f}s")
        t0 = time.time()
        proof = prove_on_device(air, rows, fc)
        dt = time.time() - t0
        print(f"re-prove: {dt:.2f}s "
              f"({n_perms / dt:.1f} keccak-f proved/s/chip)")
        print("verifies:",
              bool(np.asarray(verify_proof(proof, air, fc).ok)))
    else:
        # chunk the constraint eval so wide-AIR intermediates fit HBM at
        # large B (B=16 un-chunked OOMs at 20.6G on v5e-1); with the
        # strided sub-coset segmentation the live set per segment scales
        # as 1/qec, so larger batches take more segments
        qec = (int(os.environ.get("KECCAK_QEC", "0"))
               or (8 if batch >= 12 else 4 if batch >= 8 else 1))
        traces = [rows] * batch
        t0 = time.time()
        prove_batch_on_device(air, traces, fc, quotient_eval_chunks=qec)
        print(f"first batch prove (incl. compile): {time.time() - t0:.1f}s")
        t0 = time.time()
        proofs = prove_batch_on_device(air, traces, fc,
                                       quotient_eval_chunks=qec)
        dt = time.time() - t0
        print(f"batch re-prove B={batch}: {dt:.2f}s "
              f"({batch * n_perms / dt:.1f} keccak-f proved/s/chip)")
        print("verifies:",
              bool(np.asarray(verify_proof(proofs[0], air, fc).ok)))


if __name__ == "__main__":
    main()
