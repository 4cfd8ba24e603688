"""One-shot TPU validation for the round-3 changes.

Run on a live TPU:  python scripts/tpu_round3_validate.py [stage ...]

Stages (default: all):
  verify   golden artifact through the jitted verifier + tamper probe
  prover   fib(64) byte-exact reproduction + fib(2^10) steady latency
  attest   self-contained attestation of the golden proof (warm timing)
  batch    batched attest_many over 4 golden proofs (warm timing)
Prints one line per stage; exits nonzero on any failure.
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

import copy
import numpy as np

ARTIFACT = "/root/reference/artifacts/proof_fibonacci.json"


def stage_verify():
    from plonky25_tpu import FriConfig, load_proof
    from plonky25_tpu.models import FibonacciAir
    from plonky25_tpu.verifier import verify_proof

    proof = load_proof(ARTIFACT)
    fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    assert bool(np.asarray(verify_proof(proof, FibonacciAir(), fc).ok))
    bad = copy.deepcopy(proof)
    bad.opening_proof.fri_proof.pow_witness += 1
    assert not bool(np.asarray(verify_proof(bad, FibonacciAir(), fc).ok))
    print("verify: golden OK, tamper rejected")


def stage_prover():
    import dataclasses

    from plonky25_tpu import FriConfig, load_proof
    from plonky25_tpu.models.fibonacci import FibonacciAir, fibonacci_trace
    from plonky25_tpu.prover import prove_on_device

    fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    golden = load_proof(ARTIFACT)

    def deep_eq(a, b):
        if dataclasses.is_dataclass(a):
            return all(deep_eq(getattr(a, f.name), getattr(b, f.name))
                       for f in dataclasses.fields(a))
        if isinstance(a, (list, tuple)):
            return len(a) == len(b) and all(
                deep_eq(x, y) for x, y in zip(a, b))
        return a == b

    assert deep_eq(prove_on_device(FibonacciAir(), fibonacci_trace(64), fc),
                   golden)
    tr = fibonacci_trace(1 << 10)
    prove_on_device(FibonacciAir(), tr, fc)
    t0 = time.time()
    prove_on_device(FibonacciAir(), tr, fc)
    print(f"prover: golden byte-exact, fib(2^10) steady {time.time()-t0:.2f}s")


def stage_attest():
    from plonky25_tpu import FriConfig, load_proof
    from plonky25_tpu.attest import attest, check_attestation
    from plonky25_tpu.models import FibonacciAir

    fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    proof = load_proof(ARTIFACT)
    air = FibonacciAir()
    b = attest(proof, air, fc)           # warm modules
    t0 = time.time()
    b = attest(proof, air, fc)
    t_att = time.time() - t0
    t0 = time.time()
    ok = check_attestation(b, proof, air, fc)
    t_chk = time.time() - t0
    assert ok
    bad = copy.deepcopy(b)
    bad.samples[0] = (bad.samples[0] + 1) % ((1 << 64) - (1 << 32) + 1)
    assert not check_attestation(bad, proof, air, fc)
    print(f"attest: warm attest {t_att:.2f}s, self-contained check "
          f"{t_chk:.2f}s, tamper rejected")


def stage_batch():
    from plonky25_tpu import FriConfig, load_proof
    from plonky25_tpu.attest import attest_many, check_attestations
    from plonky25_tpu.models import FibonacciAir

    fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    proofs = [load_proof(ARTIFACT) for _ in range(4)]
    air = FibonacciAir()
    attest_many(proofs, air, fc)         # warm
    t0 = time.time()
    mb = attest_many(proofs, air, fc)
    t_att = time.time() - t0
    t0 = time.time()
    ok = check_attestations(mb, proofs, air, fc)
    t_chk = time.time() - t0
    assert ok
    print(f"batch: warm attest_many(4) {t_att:.2f}s, check {t_chk:.2f}s")


def stage_recurse():
    """Recursive composition: attest the verification of an attestation
    STARK (VerifierAir target) end-to-end on device, then check the
    outer bundle with the inner verification replaced by schedule
    recomputation + the outer STARK."""
    from plonky25_tpu import FriConfig, load_proof
    from plonky25_tpu.attest import (attest, attest_attestation,
                                     check_attested_attestation)
    from plonky25_tpu.models import FibonacciAir

    fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    proof = load_proof(ARTIFACT)
    air = FibonacciAir()
    inner = attest(proof, air, fc)
    t0 = time.time()
    outer = attest_attestation(inner)
    t_att = time.time() - t0
    t0 = time.time()
    ok = check_attested_attestation(outer, inner, proof, air, fc)
    t_chk = time.time() - t0
    assert ok
    bad = copy.deepcopy(inner)
    bad.acc = ((bad.acc[0] + 1) % ((1 << 64) - (1 << 32) + 1), bad.acc[1])
    assert not check_attested_attestation(outer, bad, proof, air, fc)
    print(f"recurse: outer attest {t_att:.1f}s, check {t_chk:.2f}s, "
          f"tamper rejected")


STAGES = {"verify": stage_verify, "prover": stage_prover,
          "attest": stage_attest, "batch": stage_batch,
          "recurse": stage_recurse}

if __name__ == "__main__":
    names = sys.argv[1:] or list(STAGES)
    for n in names:
        STAGES[n]()
    print("tpu_round3_validate: ALL OK")
