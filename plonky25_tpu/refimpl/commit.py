"""MMCS Merkle batch verification, plain-int reference (src/p3/commit.rs)."""

from ..constants import RATE, DIGEST_ELEMS, WIDTH
from .poseidon2 import poseidon2


def hash_iter_slices(rows):
    """Overwrite-mode sponge over the flattened rows (commit.rs:23-46).

    State starts at zero; each RATE-sized chunk of the flattened input
    overwrites the state prefix, then a permutation runs.  A final partial
    chunk still triggers a permutation."""
    state = [0] * WIDTH
    flat = [v for row in rows for v in row]
    for i in range(0, len(flat), RATE):
        chunk = flat[i:i + RATE]
        for j, v in enumerate(chunk):
            state[j] = v
        state = poseidon2(state)
    return state[:DIGEST_ELEMS]


def compress(left, right):
    """2-to-1 compression: permute [left||right||0^4], keep 4 (commit.rs:48-60)."""
    state = list(left) + list(right) + [0] * (WIDTH - 2 * DIGEST_ELEMS)
    return poseidon2(state)[:DIGEST_ELEMS]


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def verify_batch(commit, dimensions, index, opened_values, proof):
    """Batched Merkle-path check (commit.rs:62-129).

    dimensions: list of (width, height) per matrix, aligned with
    opened_values rows.  Returns True iff the recomputed root equals
    `commit`.  Matrices are consumed tallest-first (stable sort); shorter
    matrices' leaf digests are folded in when the path reaches their padded
    height."""
    order = sorted(range(len(dimensions)), key=lambda i: -dimensions[i][1])
    pos = 0

    curr_height_padded = _next_pow2(dimensions[order[0]][1])

    first_rows = []
    while pos < len(order) and _next_pow2(dimensions[order[pos]][1]) == curr_height_padded:
        first_rows.append(opened_values[order[pos]])
        pos += 1
    root = hash_iter_slices(first_rows)

    for sibling in proof:
        is_odd = index & 1
        if is_odd:
            left, right = sibling, root
        else:
            left, right = root, sibling
        root = compress(left, right)
        index >>= 1
        curr_height_padded >>= 1

        if pos < len(order) and _next_pow2(dimensions[order[pos]][1]) == curr_height_padded:
            next_height = dimensions[order[pos]][1]
            rows = []
            while pos < len(order) and dimensions[order[pos]][1] == next_height:
                rows.append(opened_values[order[pos]])
                pos += 1
            digest = hash_iter_slices(rows)
            root = compress(root, digest)

    return list(root) == list(commit)
