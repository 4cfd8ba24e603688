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


class _Wide5Air:
    """Wide AIR for the column-grouped quotient path: the default width
    5 is odd so G=2 grouping zero-pads one column (Wc=3, padW=1); width
    6 exercises the exact-divisor (no-pad, input-aliased) branch."""

    def __init__(self, w: int = 5):
        self._w = w

    def name(self):
        return f"Wide{self._w}"

    def width(self):
        return self._w

    def stage2_width(self):
        return 0

    def num_challenges(self):
        return 0

    def public_values(self):
        return {}

    def quotient_degree(self):
        return 2

    def eval(self, folder):
        ops = folder.ops
        loc = folder.main.trace_local[:self._w]
        nxt = folder.main.trace_next[:self._w]
        tot = loc[0]
        for v in loc[1:]:
            tot = ops.add(tot, v)
        folder.when_transition().assert_eq(nxt[0], tot)
        folder.when_first_row().assert_eq(loc[0], ops.one())


def _wide5_trace(h, w=5):
    import random

    from plonky25_tpu.constants import GOLDILOCKS_P as GP

    rng = random.Random(11)
    rows = [[1] + [rng.randrange(GP) for _ in range(w - 1)]]
    for _ in range(h - 1):
        rows.append([sum(rows[-1]) % GP]
                    + [rng.randrange(GP) for _ in range(w - 1)])
    return rows


_W5_FC = FriConfig(log_blowup=1, num_queries=2, proof_of_work_bits=1)


@pytest.fixture(scope="module")
def wide5_base():
    """Unchunked W=5 baseline proof shared by the slab/group tests (one
    XLA:CPU prover compile set instead of one per test)."""
    from plonky25_tpu.prover.prove import TpuProver

    tr = _wide5_trace(32)
    return TpuProver(_Wide5Air(), 5, _W5_FC).prove(tr), tr


def test_quotient_col_groups_bit_equal(wide5_base):
    """The column-grouped chunked-quotient path (grouped coefficient
    transforms + group-mapped fold NTTs, the golden-scale depth-2 HBM
    fix) is bit-identical to the ungrouped strided path when grouping
    zero-pads the trailing group (W=5, G=2).  The full sweep (S=4 and
    the exact-divisor branch) is @slow below."""
    from plonky25_tpu.prover.prove import TpuProver

    base, tr = wide5_base
    got = TpuProver(_Wide5Air(), 5, _W5_FC, quotient_eval_chunks=2,
                    quotient_col_groups=2).prove(tr)
    _deep_eq(got, base, path="S=2,G=2")


@pytest.mark.slow
def test_quotient_col_groups_sweep_bit_equal(wide5_base):
    """Column-group sweep: deeper point segmentation (S=4) and the
    exact-divisor input-aliased branch (W=6, G=2)."""
    from plonky25_tpu.prover.prove import TpuProver

    base, tr = wide5_base
    got = TpuProver(_Wide5Air(), 5, _W5_FC, quotient_eval_chunks=4,
                    quotient_col_groups=2).prove(tr)
    _deep_eq(got, base, path="S=4,G=2")

    air6 = _Wide5Air(6)
    tr6 = _wide5_trace(32, 6)
    base6 = TpuProver(air6, 5, _W5_FC).prove(tr6)
    got6 = TpuProver(air6, 5, _W5_FC, quotient_eval_chunks=2,
                     quotient_col_groups=2).prove(tr6)
    _deep_eq(got6, base6, path="W6,S2,G2")


def test_opening_col_slabs_bit_equal(wide5_base):
    """Forcing the reduced-opening column-slab loop AND the slab
    barycentric opened-values path (both normally engaged only for
    wide/tall traces — the golden-scale composed outer) at W=5 is
    bit-identical to the one-shot paths."""
    from plonky25_tpu.prover.prove import TpuProver

    base, tr = wide5_base
    p = TpuProver(_Wide5Air(), 5, _W5_FC)
    p._ro_col_slab = 2      # 3 slabs of (2, 2, 1) columns
    p._bary_col_slab = 2
    _deep_eq(p.prove(tr), base, path="slab2")


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
