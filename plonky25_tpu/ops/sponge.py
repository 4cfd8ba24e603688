"""Batched MMCS sponge/Merkle primitives (reference: src/p3/commit.rs).

Everything is vectorized over a leading query-batch axis and expressed with
lax.scan over path levels so each call contributes a constant number of
permutation bodies to the compiled graph, independent of depth (the
compile-cost discipline that governs this framework).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import RATE, DIGEST_ELEMS, WIDTH
from ..fields import gl
from ..fields.goldilocks import GL
from .poseidon2 import poseidon2_permute


def hash_rows(rows: GL, permute=poseidon2_permute) -> GL:
    """Overwrite-mode sponge over rows of static width (commit.rs:23-46).

    rows: GL (..., L).  Returns GL (..., DIGEST_ELEMS).  Chunks of RATE
    overwrite the state prefix, permuting after each chunk (the final
    partial chunk included).  Wide rows (Keccak's 2633 columns => 659
    chunks) scan over chunks so the graph holds one permutation body.

    `permute` lets hot call sites swap in the fused Pallas kernel
    (ops.poseidon2.poseidon2_permute_auto)."""
    batch = rows.shape[:-1]
    L = rows.shape[-1]
    n_chunks = -(-L // RATE)
    state = gl.zeros((*batch, WIDTH))

    if n_chunks <= 4:
        for off in range(0, L, RATE):
            k = min(RATE, L - off)
            chunk = rows[..., off:off + k]
            state = GL(
                jnp.concatenate([chunk.lo, state.lo[..., k:]], axis=-1),
                jnp.concatenate([chunk.hi, state.hi[..., k:]], axis=-1),
            )
            state = permute(state)
        return state[..., :DIGEST_ELEMS]

    pad = n_chunks * RATE - L
    if pad:
        z = gl.zeros((*batch, pad))
        rows = gl.concatenate([rows, z], axis=-1)
    # (n_chunks, ..., RATE) scan inputs + static per-lane validity mask
    ch_lo = jnp.moveaxis(rows.lo.reshape(*batch, n_chunks, RATE), -2, 0)
    ch_hi = jnp.moveaxis(rows.hi.reshape(*batch, n_chunks, RATE), -2, 0)
    mask = (jnp.arange(n_chunks * RATE).reshape(n_chunks, RATE) <
            jnp.int32(L))  # (n_chunks, RATE)

    def body(st, xs):
        clo, chi_, m = xs
        head = gl.select(m, GL(clo, chi_), st[..., :RATE])
        st = gl.concatenate([head, st[..., RATE:]], axis=-1)
        return permute(st), None

    state, _ = jax.lax.scan(body, state, (ch_lo, ch_hi, mask))
    return state[..., :DIGEST_ELEMS]


def compress(left: GL, right: GL, permute=poseidon2_permute) -> GL:
    """2-to-1: permute [left||right||0^4], keep 4 (commit.rs:48-60).

    left/right: GL (..., 4)."""
    batch = left.shape[:-1]
    zeros = gl.zeros((*batch, WIDTH - 2 * DIGEST_ELEMS))
    state = gl.concatenate([left, right, zeros], axis=-1)
    return permute(state)[..., :DIGEST_ELEMS]


def merkle_path(leaf_digest: GL, index, siblings: GL, valid=None,
                permute=poseidon2_permute):
    """Walk a batch of Merkle paths (commit.rs:92-123, single-matrix case).

    leaf_digest: GL (Q, 4); index: uint32 (Q,); siblings: GL (Q, D, 4);
    valid: optional bool (D,) — or per-lane (D, Q) for batches mixing
    paths of different true depths — mask for padded depths (masked steps
    leave the root and index untouched).  Returns (root GL (Q, 4),
    index_out (Q,)).
    """
    D = siblings.shape[-2]
    if valid is None:
        valid = jnp.ones((D,), bool)
    if valid.ndim == 1:
        valid = valid[:, None]  # (D, 1): broadcasts against (Q,) lanes
    sib_scan = GL(
        jnp.moveaxis(siblings.lo, -2, 0),
        jnp.moveaxis(siblings.hi, -2, 0),
    )  # (D, Q, 4)

    def body(carry, xs):
        root, idx = carry
        sib, v = xs
        is_odd = (idx & jnp.uint32(1)).astype(bool)[..., None]
        left = gl.select(is_odd, sib, root)
        right = gl.select(is_odd, root, sib)
        new_root = compress(left, right, permute)
        root = gl.select(v[..., None], new_root, root)
        idx = jnp.where(v, idx >> 1, idx)
        return (root, idx), None

    (root, idx), _ = jax.lax.scan(
        body, (leaf_digest, jnp.asarray(index, jnp.uint32)), (sib_scan, valid)
    )
    return root, idx


def verify_batch_single(commit: GL, leaf_rows: GL, index, siblings: GL,
                        valid=None, permute=poseidon2_permute):
    """verify_batch for a batch whose matrices all live at the tallest
    height (the case the fibonacci workload exercises; the general
    multi-height fold-in is `verify_batch` below).

    commit: GL (4,); leaf_rows: GL (Q, L); index (Q,); siblings (Q, D, 4).
    Returns ok: bool (Q,)."""
    digest = hash_rows(leaf_rows, permute)
    root, _ = merkle_path(digest, index, siblings, valid, permute)
    want = gl.broadcast_to(commit, root.shape)
    return jnp.all(gl.eq(root, want), axis=-1)


def verify_batch(commit: GL, group_rows, group_log_heights, index,
                 siblings: GL, permute=poseidon2_permute):
    """General multi-height MMCS verify_batch (commit.rs:62-129), batched
    over a query axis.

    The reference walks the path from the tallest matrices' leaves and,
    whenever the climbing node reaches a shorter group's padded height,
    folds that group's leaf digest in with one extra compress
    (commit.rs:105-123).  Which levels fold which groups is a pure
    function of the matrix dimensions, so on TPU the path becomes a
    STATIC schedule: scan the sibling levels in segments between fold-in
    events, with one eager compress per event — the traced graph holds
    one compress body per segment plus one per event, never per level.

    commit: GL (4,).
    group_rows: per height group (tallest first), the concatenation of the
        group's matrices' opened rows — GL (Q, L_g).  Matrices whose
        padded heights are equal must be pre-merged into one group, in
        batch order (matching the reference's tallest-first stable sort
        and its exact-height fold grouping, commit.rs:72-76, 114-117).
    group_log_heights: static padded log-heights per group, strictly
        decreasing; group 0's equals the path depth.
    index: uint32 (Q,); siblings: GL (Q, D, 4).
    Returns ok: bool (Q,)."""
    D = siblings.shape[-2]
    lh0 = group_log_heights[0]
    assert lh0 == D, f"path depth {D} != tallest log height {lh0}"
    assert list(group_log_heights) == sorted(group_log_heights, reverse=True)
    assert len(set(group_log_heights)) == len(group_log_heights), (
        "equal-padded-height matrices must be merged into one group")

    digests = [hash_rows(r, permute) for r in group_rows]
    # group g folds in after compress #(lh0 - lh_g) (commit.rs:107-117)
    fold_at = {lh0 - lh: gi
               for gi, lh in enumerate(group_log_heights[1:], start=1)}
    root = digests[0]
    idx = jnp.asarray(index, jnp.uint32)
    t0 = 0
    for t in sorted(set(fold_at) | {D}):
        if t > t0:
            root, idx = merkle_path(
                root, idx,
                GL(siblings.lo[..., t0:t, :], siblings.hi[..., t0:t, :]),
                permute=permute)
        if t in fold_at:
            root = compress(root, digests[fold_at[t]], permute)
        t0 = t
    want = gl.broadcast_to(commit, root.shape)
    return jnp.all(gl.eq(root, want), axis=-1)
