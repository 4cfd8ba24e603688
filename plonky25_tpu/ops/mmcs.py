"""Device-side MMCS Merkle tree construction and opening (prover side).

The reference only VERIFIES Merkle paths (src/p3/commit.rs); building the
trees is the prover-side counterpart: batched leaf hashing (hash_rows) and
per-level 2-to-1 compression, all on device.  Levels have halving shapes,
so each level is an eagerly-dispatched jitted kernel (jit caches one
executable per shape; trees of one height compile once).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ..fields import gl
from ..fields.goldilocks import GL
from .poseidon2 import poseidon2_permute_auto
from .sponge import compress, hash_rows


def _build_tree_impl(rows: GL, permute):
    levels = [hash_rows(rows, permute)]
    while levels[-1].shape[0] > 1:
        prev = levels[-1]
        levels.append(compress(prev[0::2], prev[1::2], permute))
    return tuple(levels)


@jax.jit
def _build_tree(rows: GL):
    """Leaf hashes + every compression level in ONE device dispatch.

    Eagerly dispatching one kernel per level cost ~17 host->device round
    trips over the TPU tunnel (~10x the compute time of a 2^17-leaf tree);
    a single jit with the log2(N) levels statically unrolled runs the whole
    build on device.  Prover-side hashing is also the one place batches get
    big, so levels route through the backend-aware permute dispatcher
    (fused Pallas kernel on TPU, scan-based jnp path on CPU / tiny levels).
    """
    return _build_tree_impl(rows, poseidon2_permute_auto)


def _build_tree_jnp(rows: GL):
    """Tree build on the scan-based jnp permute — the form safe to vmap
    (a pallas_call under vmap lowers to a serial per-proof grid loop)."""
    from .poseidon2 import poseidon2_permute

    return _build_tree_impl(rows, poseidon2_permute)


def _build_tree_batched_impl(rows: GL, permute):
    """Trees for a PROOF BATCH without vmap: rows (B, N, L) -> levels of
    (B, m, 4).  The proof axis rides the permute's flattened batch, so the
    backend-aware dispatcher can use the fused Pallas kernel (which a vmap
    would serialize into a per-proof grid loop)."""
    levels = [hash_rows(rows, permute)]           # (B, N, 4)
    while levels[-1].shape[1] > 1:
        prev = levels[-1]
        levels.append(compress(prev[:, 0::2], prev[:, 1::2], permute))
    return tuple(levels)


@jax.jit
def _build_tree_batched(rows: GL):
    return _build_tree_batched_impl(rows, poseidon2_permute_auto)


class DeviceMerkleTree:
    """Poseidon2 MMCS tree over the rows of a base-field matrix on device.

    rows: GL (N, L), N a power of two.  Levels stored as GL (n, 4)."""

    def __init__(self, rows: GL):
        n = rows.shape[0]
        assert n & (n - 1) == 0
        self.levels: List[GL] = list(_build_tree(rows))

    @property
    def root(self) -> GL:
        return self.levels[-1][0]

    def root_host(self) -> list:
        return [int(v) for v in gl.to_u64_np(self.root)]

    def open_paths(self, indices) -> GL:
        """Sibling digests for a batch of leaf indices.

        indices: (Q,) uint32 -> GL (Q, depth, 4), level t sibling =
        levels[t][(idx >> t) ^ 1].  One jitted dispatch (eager per-level
        gathers each cost a tunnel round trip)."""
        idx = jnp.asarray(indices, jnp.uint32)
        return _open_paths(tuple(self.levels), idx)


@jax.jit
def _open_paths(levels, idx):
    sibs = [levels[t][(idx >> t) ^ 1] for t in range(len(levels) - 1)]
    return GL(
        jnp.stack([s.lo for s in sibs], axis=1),
        jnp.stack([s.hi for s in sibs], axis=1),
    )
