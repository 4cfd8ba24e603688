"""Device (JAX) prover: bit-identical to the reference prover / artifact."""

import dataclasses

import numpy as np
import pytest

from plonky25_tpu.models.fibonacci import FibonacciAir, fibonacci_trace
from plonky25_tpu.proof import FriConfig
from plonky25_tpu.prover import prove_on_device

FC = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)


def _deep_eq(a, b, path=""):
    if dataclasses.is_dataclass(a):
        for f in dataclasses.fields(a):
            _deep_eq(getattr(a, f.name), getattr(b, f.name), path + "." + f.name)
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), (path, len(a), len(b))
        for i, (x, y) in enumerate(zip(a, b)):
            _deep_eq(x, y, f"{path}[{i}]")
    else:
        assert a == b, (path, a, b)


def test_device_prover_reproduces_artifact(golden_proof):
    proof = prove_on_device(FibonacciAir(), fibonacci_trace(64), FC)
    _deep_eq(proof, golden_proof)


def test_device_prover_other_shape_roundtrip():
    fc = FriConfig(log_blowup=1, num_queries=16, proof_of_work_bits=4)
    proof = prove_on_device(FibonacciAir(), fibonacci_trace(128), fc)
    assert proof.degree_bits == 7

    from plonky25_tpu.refimpl.verifier import verify
    assert verify(proof, FibonacciAir(), fc).ok

    from plonky25_tpu.verifier import verify_proof
    r = verify_proof(proof, FibonacciAir(), fc)
    assert bool(np.asarray(r.ok))


def test_chunked_quotient_eval_fast_tier():
    """Default-tier guard for quotient_eval_chunks > 1: one tiny case so a
    regression in the strided sub-coset segmentation surfaces in every CI
    run, not only in slow-tier sweeps (r4 advisor finding).  The full
    grid (S in {2,8}, multi-stage, keccak) stays @slow below."""
    from plonky25_tpu.prover.prove import TpuProver

    fc = FriConfig(log_blowup=1, num_queries=2, proof_of_work_bits=1)
    base = TpuProver(FibonacciAir(), 5, fc).prove(fibonacci_trace(32))
    got = TpuProver(FibonacciAir(), 5, fc,
                    quotient_eval_chunks=2).prove(fibonacci_trace(32))
    _deep_eq(got, base, path="fast-S2")


@pytest.mark.slow
def test_chunked_quotient_eval_bit_equal():
    """quotient_eval_chunks > 1 (strided sub-coset segmentation: locals/
    nexts per segment via folded shift-scaled NTTs, never materializing
    the full (W, q) arrays) is bit-identical to the unchunked path —
    on a single-stage AIR and on a multi-stage one."""
    from plonky25_tpu.prover.prove import TpuProver

    fc = FriConfig(log_blowup=1, num_queries=8, proof_of_work_bits=4)
    base = TpuProver(FibonacciAir(), 5, fc).prove(fibonacci_trace(32))
    for s in (2, 8):
        got = TpuProver(FibonacciAir(), 5, fc,
                        quotient_eval_chunks=s).prove(fibonacci_trace(32))
        _deep_eq(got, base, path=f"S={s}")

    import random

    from plonky25_tpu.models.rlc_air import RlcAir

    rng = random.Random(5)
    trace = [[rng.randrange(1 << 63), rng.randrange(1 << 63)]
             for _ in range(16)]
    base = TpuProver(RlcAir(), 4, fc).prove(trace)
    got = TpuProver(RlcAir(), 4, fc, quotient_eval_chunks=4).prove(trace)
    _deep_eq(got, base, path="rlc-S4")
