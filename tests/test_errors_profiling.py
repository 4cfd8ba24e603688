"""Typed error surface + profiling utilities (SURVEY.md §5 subsystems)."""

import copy

import numpy as np
import pytest

from plonky25_tpu import FriConfig, InvalidProofShape, check_proof_shape, derive_config
from plonky25_tpu.models import FibonacciAir
from plonky25_tpu.utils import StageTimer, measure_throughput

FC = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)


def test_check_proof_shape_accepts_golden(golden_proof):
    check_proof_shape(golden_proof, derive_config(golden_proof, FC))


def test_wrong_query_count_raises(golden_proof):
    bad_fc = FriConfig(log_blowup=1, num_queries=50, proof_of_work_bits=16)
    cfg = derive_config(golden_proof, bad_fc)
    with pytest.raises(InvalidProofShape, match="query proofs"):
        check_proof_shape(golden_proof, cfg)


def test_wrong_trace_width_is_shape_fail(golden_proof):
    from plonky25_tpu.verifier import get_verifier

    p = copy.deepcopy(golden_proof)
    p.opened_values.trace_local = p.opened_values.trace_local[:2]
    v = get_verifier(FibonacciAir(), derive_config(golden_proof, FC))
    assert not v.check_shape(p)
    r = v.verify(p)
    assert not bool(np.asarray(r.ok)) and not r.shape_ok


def _mutation_sites(node, path=()):
    """All (path, kind) mutation sites in a JSON tree: every list (kind
    'del': remove last element) and every int leaf (kind 'bump')."""
    if isinstance(node, dict):
        for k, v in node.items():
            yield from _mutation_sites(v, path + (k,))
    elif isinstance(node, list):
        if node:
            yield (path, "del")
        for i, v in enumerate(node):
            yield from _mutation_sites(v, path + (i,))
    elif isinstance(node, int):
        yield (path, "bump")


def _apply(obj, path, kind):
    node = obj
    for key in path[:-1]:
        node = node[key]
    if kind == "del":
        node[path[-1]] = node[path[-1]][:-1]
    else:
        node[path[-1]] = node[path[-1]] + 1


def _stride_sample(items, n):
    if len(items) <= n:
        return items
    stride = len(items) / n
    return [items[int(i * stride)] for i in range(n)]


def _run_structural_fuzz(n_del, n_bump):
    """Every sampled single-field mutation of the golden proof either
    raises InvalidProofShape or verifies False — never an uncaught
    exception (VERDICT r1 weak #2; reference behavior: panics at
    verifier.rs:126-133, 372-374 — we do strictly better)."""
    import json

    import jax.numpy as jnp

    from plonky25_tpu.proof import proof_from_json
    from plonky25_tpu.verifier import verify_proof

    with open("/root/reference/artifacts/proof_fibonacci.json") as f:
        base = json.load(f)

    sites = list(_mutation_sites(base))
    dels = [s for s in sites if s[1] == "del"]
    bumps = [s for s in sites if s[1] == "bump"]
    sample = _stride_sample(dels, n_del) + _stride_sample(bumps, n_bump)
    # plus targeted structural fields
    sample += [(("degree_bits",), "bump")]

    air = FibonacciAir()
    n_shape_fail = n_value_fail = 0
    for path, kind in sample:
        mutant = copy.deepcopy(base)
        _apply(mutant, path, kind)
        try:
            p = proof_from_json(mutant)
        except InvalidProofShape:
            n_shape_fail += 1
            continue
        r = verify_proof(p, air, FC)
        if not r.shape_ok:
            n_shape_fail += 1
        else:
            assert not bool(jnp.asarray(r.ok)), (
                f"mutant {kind} at {path} verified OK")
            n_value_fail += 1
    # both rejection modes must actually be exercised
    assert n_shape_fail > 0 and n_value_fail > 0


def test_structural_fuzz_sample(golden_proof):
    """Default-tier fuzz: a 20-mutant stride sample — enough to exercise
    both rejection modes every CI run.  The full 100-mutant sweep
    (value-fail mutants each run a golden-size verification, and
    shape-bumping mutants each compile a fresh XLA:CPU verifier — the
    single biggest default-tier cost in the r5 durations measurement)
    runs in the slow tier."""
    _run_structural_fuzz(14, 6)


@pytest.mark.slow
def test_structural_fuzz_full(golden_proof):
    _run_structural_fuzz(70, 30)


def test_stage_timer_and_throughput():
    t = StageTimer()
    import jax.numpy as jnp

    x = jnp.arange(8)
    with t.stage("double") as h:
        h["result"] = x * 2
    s = t.summary()
    assert s["double"]["n"] == 1 and s["double"]["total_s"] >= 0

    m = measure_throughput(lambda a: a + 1, (x,), n_items=8, iters=3)
    assert m["items_per_sec"] > 0


def test_cached_instances_refresh_air_publics(golden_proof):
    """Advisor r2 high finding: same-name airs (every HashChainAir is
    "HashChain") share a cached verifier/prover instance, but publics are
    read at run time from instance.air — a stale air would prove/verify
    against the FIRST caller's publics.  The caches must refresh .air on
    every hit."""
    from plonky25_tpu.models.fibonacci import FibonacciAir
    from plonky25_tpu.models.poseidon2_air import HashChainAir
    from plonky25_tpu.proof import derive_config
    from plonky25_tpu.verifier import get_verifier

    cfg = derive_config(golden_proof, FC)
    a1 = HashChainAir({"gamma": (1, 2), "acc": (3, 4), "acc_out": (5, 6)})
    a2 = HashChainAir({"gamma": (7, 8), "acc": (9, 10), "acc_out": (11, 12)})
    # widths must match the config for get_verifier keying; use Fibonacci
    # (same-name instances with distinct publics) for the real-cfg probe
    f1, f2 = FibonacciAir(), FibonacciAir()
    assert f1.name() == f2.name()
    v1 = get_verifier(f1, cfg)
    v2 = get_verifier(f2, cfg)
    assert v2 is v1 and v2.air is f2

    hcfgs = [a for a in (a1, a2)]
    keyed = {}
    for a in hcfgs:
        keyed[id(a)] = a
    # prover-side refresh mirrors the verifier; exercised structurally
    import plonky25_tpu.prover.prove as PP

    class _FakeProver:
        def __init__(self):
            self.air = a1

        def prove(self, rows):
            return self.air

    key = (a1.name(), a1.width(), 3, FC.log_blowup, FC.num_queries,
           FC.proof_of_work_bits)
    PP._prover_cache[key] = _FakeProver()
    try:
        got = PP.prove_on_device(a2, [[0] * a2.width()] * 8, FC)
        assert got is a2
    finally:
        del PP._prover_cache[key]
