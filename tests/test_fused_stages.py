"""Fused hash-stage equivalence: the one-dispatch batch/fold forms must
produce exactly the per-commitment / per-level results they replaced.

The fused Merkle-batch walk zero-pads single-chunk leaves to RATE
(hash-identical because the overwrite-mode sponge state starts at zero,
commit.rs:37-45) and concatenates the batch axis onto the query lane;
the fused fold hashes all levels' 2-row leaves in one call and walks all
paths together under a per-lane validity mask.  These tests pin the
fused forms against the sequential per-batch `verify_batch_single` and
against an explicitly level-by-level walk on random data, including the
multi-chunk fallback (leaf width > RATE) and mixed path depths.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from plonky25_tpu.constants import DIGEST_ELEMS, GOLDILOCKS_P as P, RATE
from plonky25_tpu.fields import gl
from plonky25_tpu.ops.sponge import (
    compress,
    hash_rows,
    merkle_path,
    verify_batch_single,
)

rng = random.Random(0xF05ED)


def _rand_gl(*shape):
    flat = np.array([rng.randrange(P) for _ in range(int(np.prod(shape)))],
                    dtype=np.uint64).reshape(shape)
    return gl.from_u64(flat)


def _build_tree(leaves_rows):
    """Merkle-tree levels over hashed rows (leaf digests first)."""
    digs = hash_rows(leaves_rows)
    levels = [digs]
    while levels[-1].lo.shape[0] > 1:
        cur = levels[-1]
        left = cur[0::2]
        right = cur[1::2]
        levels.append(compress(left, right))
    return levels


def _siblings(levels, index):
    sibs_lo, sibs_hi = [], []
    ix = index
    for lvl in levels[:-1]:
        sib = lvl[ix ^ 1]
        sibs_lo.append(np.asarray(sib.lo))
        sibs_hi.append(np.asarray(sib.hi))
        ix >>= 1
    return sibs_lo, sibs_hi


def _get_verifier():
    from plonky25_tpu import FriConfig, load_proof
    from plonky25_tpu.models import FibonacciAir
    from plonky25_tpu.proof import derive_config
    from plonky25_tpu.verifier import get_verifier

    proof = load_proof("/root/reference/artifacts/proof_fibonacci.json")
    fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    return get_verifier(FibonacciAir(), derive_config(proof, fc))


@pytest.mark.parametrize("widths,hlog", [
    ((3, 4), 6),            # golden family: single-chunk, equal depth
    ((2, 4, 3), 5),         # three batches (multi-stage shape)
    ((6, 4), 6),            # width 6 > RATE: multi-chunk fallback
])
def test_batch_all_matches_sequential(widths, hlog):
    v = _get_verifier()
    Q = 9
    index = jnp.asarray(
        np.array([rng.randrange(1 << hlog) for _ in range(Q)]), jnp.uint32)
    # all batches share the query indices (as in a real proof)
    batches = [_make_batch_at(index, hlog, w) for w in widths]
    vals = tuple(b[0] for b in batches)
    sibs = tuple(b[1] for b in batches)
    commits = tuple(b[2] for b in batches)

    fused = np.asarray(v._batch_all_fn(index, vals, sibs, commits))
    seq = None
    for vl, sb, cm in zip(vals, sibs, commits):
        okb = np.asarray(verify_batch_single(
            cm, vl.reshape(vl.shape[0], -1), index, sb))
        seq = okb if seq is None else (seq & okb)
    assert fused.tolist() == seq.tolist()
    assert bool(fused.all())

    # tampering any single batch's sibling flips the fused verdict
    for b in range(len(widths)):
        bad = list(sibs)
        from plonky25_tpu.fields.goldilocks import GL
        lo = np.asarray(bad[b].lo).copy()
        lo[3, 0, 0] ^= 1
        bad[b] = GL(jnp.asarray(lo), bad[b].hi)
        out = np.asarray(v._batch_all_fn(index, vals, tuple(bad), commits))
        assert not bool(out[3])


def _make_batch_at(index, height_log, width):
    """Batch opened at the SAME query indices."""
    n = 1 << height_log
    rows = _rand_gl(n, width)
    levels = _build_tree(rows)
    root = levels[-1][0]
    idxs = [int(i) % n for i in np.asarray(index)]
    vals = rows[np.array(idxs)].reshape(len(idxs), 1, width)
    slo = np.zeros((len(idxs), height_log, DIGEST_ELEMS), np.uint32)
    shi = np.zeros_like(slo)
    for q, ix in enumerate(idxs):
        lo_list, hi_list = _siblings(levels, ix)
        slo[q] = np.stack(lo_list)
        shi[q] = np.stack(hi_list)
    from plonky25_tpu.fields.goldilocks import GL
    return vals, GL(jnp.asarray(slo), jnp.asarray(shi)), root


def test_merkle_path_per_lane_valid():
    """(D, Q) per-lane masks: each lane stops at its own true depth."""
    hlog = 5
    n = 1 << hlog
    rows = _rand_gl(n, 3)
    levels = _build_tree(rows)
    Q = 6
    idxs = np.array([rng.randrange(n) for _ in range(Q)])
    digs = hash_rows(rows[idxs])

    slo = np.zeros((Q, hlog, DIGEST_ELEMS), np.uint32)
    shi = np.zeros_like(slo)
    for q, ix in enumerate(idxs):
        lo_list, hi_list = _siblings(levels, int(ix))
        slo[q] = np.stack(lo_list)
        shi[q] = np.stack(hi_list)
    from plonky25_tpu.fields.goldilocks import GL
    sibs = GL(jnp.asarray(slo), jnp.asarray(shi))

    # lane q walks only depths[q] levels; expected root = the
    # intermediate node at that height
    depths = np.array([5, 3, 1, 5, 2, 4])
    valid = jnp.asarray(np.arange(hlog)[:, None] < depths[None, :])
    root, _ = merkle_path(digs, jnp.asarray(idxs, jnp.uint32), sibs, valid)
    root_lo = np.asarray(root.lo)
    for q in range(Q):
        node = levels[depths[q]][int(idxs[q]) >> int(depths[q])]
        assert root_lo[q].tolist() == np.asarray(node.lo).tolist()


def test_fold_grouped_variant_matches_wide():
    """Both fold path-walk shapes (fused uniform-depth / depth-grouped)
    accept the golden proof and reject a sibling tamper identically."""
    import plonky25_tpu.verifier as V
    from plonky25_tpu import FriConfig, load_proof
    from plonky25_tpu.models import FibonacciAir
    from plonky25_tpu.proof import derive_config
    from plonky25_tpu.witness import pack_witness

    proof = load_proof("/root/reference/artifacts/proof_fibonacci.json")
    fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    v = _get_verifier()
    w = pack_witness(proof, derive_config(proof, fc))
    t = v._s_transcript(w["obs"])
    ro = v._s_ro(
        t["index"], t["zeta"], t["zeta_next"], t["alpha_fri"],
        tuple(w["batch_values"]),
        w["trace_local"], w["trace_next"], w["quotient_chunks"],
    )
    args = (t["index"], t["phase_commits"], t["betas_stack"],
            w["fold_sibling_values"], ro, w["fold_sibs"], w["final_poly"])
    lo = np.asarray(w["fold_sibs"].lo).copy()
    lo[2, 5, 1, 0] ^= 1
    from plonky25_tpu.fields.goldilocks import GL
    bad_sibs = GL(jnp.asarray(lo), w["fold_sibs"].hi)
    bad_args = args[:5] + (bad_sibs,) + args[6:]

    old = V._FOLD_WIDE_MAX_LANES
    try:
        V._FOLD_WIDE_MAX_LANES = 1 << 30      # force fused wide walk
        assert bool(np.asarray(v._fold_fn(*args)))
        assert not bool(np.asarray(v._fold_fn(*bad_args)))
        V._FOLD_WIDE_MAX_LANES = -1           # force depth-grouped walk
        assert bool(np.asarray(v._fold_fn(*args)))
        assert not bool(np.asarray(v._fold_fn(*bad_args)))
    finally:
        V._FOLD_WIDE_MAX_LANES = old


def test_fused_whole_verify_matches_staged():
    """The one-dispatch fused verify (TpuVerifier._verify_all_fn, the
    single-proof TPU fast path) agrees bit-for-bit with the five staged
    dispatches on the golden proof, on a tampered proof, and on the
    recorded raw samples the attestation path consumes."""
    import copy

    from plonky25_tpu import FriConfig, load_proof
    from plonky25_tpu.proof import derive_config
    from plonky25_tpu.witness import pack_witness

    proof = load_proof("/root/reference/artifacts/proof_fibonacci.json")
    fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    v = _get_verifier()
    cfg = derive_config(proof, fc)

    for p in (proof,):
        w = pack_witness(p, cfg)
        a = v.verify_witness(w)
        b = v.verify_witness_fused(w)
        for f in ("ok", "pow_ok", "merkle_ok", "fold_ok", "quotient_ok"):
            assert bool(np.asarray(getattr(a, f))) == bool(
                np.asarray(getattr(b, f))), f
        assert np.array_equal(np.asarray(a.query_indices),
                              np.asarray(b.query_indices))
        assert bool(np.asarray(b.ok))

    bad = copy.deepcopy(proof)
    bad.opening_proof.fri_proof.pow_witness += 1
    wb = pack_witness(bad, cfg)
    rb = v.verify_witness_fused(wb)
    assert not bool(np.asarray(rb.ok)) and not bool(np.asarray(rb.pow_ok))

    # raw-sample record matches the staged transcript stage
    from plonky25_tpu.fields.goldilocks import to_u64_np
    from plonky25_tpu.verifier import _publics_device

    w = pack_witness(proof, cfg)
    r = v._s_all(w, _publics_device(v.air))
    t = v._s_transcript(w["obs"])
    assert np.array_equal(to_u64_np(r["samples"]), to_u64_np(t["samples"]))
