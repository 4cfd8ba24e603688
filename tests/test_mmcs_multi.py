"""General multi-height MMCS verify_batch: device path vs int oracle
(reference: src/p3/commit.rs:62-129 — VERDICT r1 missing #2)."""

import random

import jax.numpy as jnp
import numpy as np

from plonky25_tpu.constants import GOLDILOCKS_P as P
from plonky25_tpu.fields import gl
from plonky25_tpu.ops.sponge import verify_batch
from plonky25_tpu.refimpl.commit import (
    build_mmcs_tree,
    open_mmcs,
    verify_batch as verify_batch_int,
)

# heights 8, 8, 2, 1: two matrices share the tallest group, one folds in
# mid-path, one folds in at the very last level (the t == depth edge)
HEIGHTS = [8, 8, 2, 1]
WIDTHS = [3, 2, 4, 5]


def _matrices(rng):
    return [
        [[rng.randrange(P) for _ in range(w)] for _ in range(h)]
        for h, w in zip(HEIGHTS, WIDTHS)
    ]


def _pack(mats, levels, indices):
    """Group opened rows tallest-first and pack the query axis."""
    opened_all, proofs = [], []
    for ix in indices:
        o, pr = open_mmcs(mats, levels, ix)
        opened_all.append(o)
        proofs.append(pr)
    order = sorted(range(len(mats)), key=lambda i: -len(mats[i]))
    by_height = {}
    for i in order:
        by_height.setdefault(len(mats[i]), []).append(i)
    group_rows, group_logs = [], []
    for h in sorted(by_height, reverse=True):
        rows = [
            [v for i in by_height[h] for v in opened_all[q][i]]
            for q in range(len(indices))
        ]
        group_rows.append(gl.from_u64(np.asarray(rows, dtype=object)))
        group_logs.append(h.bit_length() - 1)
    sibs = gl.from_u64(np.asarray(proofs, dtype=object))  # (Q, D, 4)
    return group_rows, group_logs, sibs, opened_all, proofs


def test_multi_height_device_matches_oracle():
    rng = random.Random(404)
    mats = _matrices(rng)
    root, levels = build_mmcs_tree(mats)
    indices = list(range(8))
    group_rows, group_logs, sibs, opened_all, proofs = _pack(
        mats, levels, indices)

    # oracle accepts its own openings
    dims = [(w, h) for h, w in zip(HEIGHTS, WIDTHS)]
    for q, ix in enumerate(indices):
        assert verify_batch_int(root, dims, ix, opened_all[q], proofs[q])

    ok = verify_batch(
        gl.from_u64(root), group_rows, group_logs,
        jnp.asarray(indices, jnp.uint32), sibs)
    assert bool(np.asarray(ok).all())


def test_multi_height_tamper_rejected():
    rng = random.Random(405)
    mats = _matrices(rng)
    root, levels = build_mmcs_tree(mats)
    indices = [0, 3, 5, 7]
    group_rows, group_logs, sibs, opened_all, proofs = _pack(
        mats, levels, indices)
    root_d = gl.from_u64(root)
    idx = jnp.asarray(indices, jnp.uint32)

    # tamper an opened value in the mid-path fold-in group (query 1)
    bad = list(group_rows)
    g1 = bad[1]
    lo = g1.lo.at[1, 0].add(1)
    bad[1] = type(g1)(lo, g1.hi)
    ok = np.asarray(verify_batch(root_d, bad, group_logs, idx, sibs))
    assert not ok[1] and ok[0] and ok[2] and ok[3]

    # tamper a path sibling (query 2)
    slo = sibs.lo.at[2, 1, 3].add(1)
    ok = np.asarray(verify_batch(root_d, group_rows, group_logs, idx,
                                 type(sibs)(slo, sibs.hi)))
    assert not ok[2] and ok[0] and ok[1] and ok[3]

    # tamper the last-level fold-in group (height 1, query 0's copy)
    g3 = group_rows[2]
    bad = list(group_rows)
    bad[2] = type(g3)(g3.lo.at[0, 2].add(1), g3.hi)
    ok = np.asarray(verify_batch(root_d, bad, group_logs, idx, sibs))
    assert not ok[0] and ok[1:].all()

    # wrong commitment
    ok = np.asarray(verify_batch(
        gl.from_u64([(root[0] + 1) % P] + root[1:]),
        group_rows, group_logs, idx, sibs))
    assert not ok.any()


def test_single_height_agrees_with_verify_batch_single():
    """With one group, verify_batch degenerates to verify_batch_single."""
    from plonky25_tpu.ops.sponge import verify_batch_single

    rng = random.Random(406)
    mats = [[[rng.randrange(P) for _ in range(3)] for _ in range(8)]]
    root, levels = build_mmcs_tree(mats)
    indices = list(range(8))
    group_rows, group_logs, sibs, _, _ = _pack(mats, levels, indices)
    idx = jnp.asarray(indices, jnp.uint32)
    a = np.asarray(verify_batch(gl.from_u64(root), group_rows, group_logs,
                                idx, sibs))
    b = np.asarray(verify_batch_single(gl.from_u64(root), group_rows[0],
                                       idx, sibs))
    assert a.all() and b.all()
