"""Validate the pure-Python oracle against the golden artifact."""

import sys
import time

sys.path.insert(0, "/root/repo")

from plonky25_tpu.proof import FriConfig, load_proof
from plonky25_tpu.models.fibonacci import FibonacciAir
from plonky25_tpu.refimpl.verifier import verify

proof = load_proof("/root/reference/artifacts/proof_fibonacci.json")
t0 = time.time()
tr = verify(proof, FibonacciAir(), FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16))
dt = time.time() - t0
print(f"shape_ok={tr.shape_ok} pow_ok={tr.pow_ok} merkle_ok={tr.merkle_ok} "
      f"fold_ok={tr.fold_ok} quotient_ok={tr.quotient_ok}")
print(f"OK={tr.ok}  ({dt*1000:.0f} ms)")
print("alpha =", tr.alpha)
print("zeta  =", tr.zeta)
print("alpha_fri =", tr.alpha_fri)
print("first 8 query indices:", tr.query_indices[:8])
sys.exit(0 if tr.ok else 1)
