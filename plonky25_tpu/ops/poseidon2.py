"""Poseidon2 width-12 permutation over Goldilocks, batched for TPU.

The permutation the reference evaluates natively per gate row
(src/common/poseidon2/poseidon2.rs:59-91) becomes here a batched jnp
computation over an arbitrary leading batch shape: `state` is a GL array of
shape (..., 12) and every round vectorizes across batch lanes on the VPU.
There is no "gate"/constraint form on TPU — the permutation itself is the
product (SURVEY.md §7).

Compile-cost discipline (the practical constraint on this machine): rounds
are expressed in *array form* — the S-box acts on the whole (..., 12) array
(4 field muls per round, not 4 per lane) — and iterated with `lax.scan`, so
the traced graph holds one external-round body and one internal-round body
regardless of round count.

Linear layers:
  - external M_E = circ(2*M4, M4, M4) via the add/double chain of
    poseidon2.rs:185-243 (adds only — no field muls), vectorized over the
    three 4-lane blocks;
  - internal M_I = diag(MAT_DIAG_M_1) + ones (poseidon2.rs:164-182):
    one field mul per lane plus a shared lane-sum.

Constants from plonky25_tpu.constants (poseidon2_goldilocks.rs:11-164).
Bit-exactness is asserted against the artifact-validated refimpl oracle
(the reference repo's own hadeshash KAT vectors are stale; see
tests/test_poseidon2.py).
"""

from __future__ import annotations

import jax

from ..constants import (
    GOLDILOCKS_P as P,
    WIDTH,
    ROUND_F_BEGIN,
    ROUND_F_END,
    MAT_DIAG_M_1,
    RC,
    RC_MID,
)
from ..fields import gl
from ..fields.goldilocks import GL


def _rc_ext() -> GL:
    """External round constants as a GL array of shape (8, 12)."""
    return gl.from_u64(RC)


def _rc_mid() -> GL:
    """Internal round constants, shape (22,)."""
    return gl.from_u64(RC_MID)


def _diag() -> GL:
    """Internal-matrix diagonal multipliers (MAT_DIAG_M_1 - 1), shape (12,)."""
    return gl.from_u64([(d - 1) % P for d in MAT_DIAG_M_1])


def _sbox(x: GL) -> GL:
    """x^7 elementwise (poseidon2.rs:114-121)."""
    x2 = gl.square(x)
    x4 = gl.square(x2)
    x3 = gl.mul(x, x2)
    return gl.mul(x3, x4)


def _expand(x: GL, idx) -> GL:
    return GL(x.lo[idx], x.hi[idx])


def _matmul_external(state: GL) -> GL:
    """M_E on (..., 12): M4 per block (vectorized over the 3 blocks), then
    add per-position block sums (poseidon2.rs:127-147)."""
    batch = state.shape[:-1]
    b = state.reshape(*batch, 3, 4)
    x0, x1, x2, x3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    t0 = gl.add(x0, x1)
    t1 = gl.add(x2, x3)
    t2 = gl.add(t1, gl.double(x1))
    t3 = gl.add(t0, gl.double(x3))
    t4 = gl.add(t3, gl.scale_small(t1, 4))
    t5 = gl.add(t2, gl.scale_small(t0, 4))
    m4 = gl.stack([gl.add(t3, t5), t5, gl.add(t2, t4), t4], axis=-1)  # (...,3,4)
    stored = gl.add(gl.add(m4[..., 0, :], m4[..., 1, :]), m4[..., 2, :])  # (...,4)
    out = gl.add(m4, _expand(stored, (..., None, slice(None))))
    return out.reshape(*batch, WIDTH)


def _sum_lanes(state: GL) -> GL:
    """Sum of the 12 lanes, (..., 12) -> (...,), as a small add tree."""
    batch = state.shape[:-1]
    b = state.reshape(*batch, 3, 4)
    t = gl.add(gl.add(b[..., 0, :], b[..., 1, :]), b[..., 2, :])  # (..., 4)
    return gl.add(gl.add(t[..., 0], t[..., 1]), gl.add(t[..., 2], t[..., 3]))


def _external_round(state: GL, rc_row: GL) -> GL:
    state = gl.add(state, rc_row)
    state = _sbox(state)
    return _matmul_external(state)


def _internal_round(state: GL, rc: GL, diag: GL) -> GL:
    lane0 = _sbox(gl.add(state[..., 0], rc))
    state = GL(
        state.lo.at[..., 0].set(lane0.lo),
        state.hi.at[..., 0].set(lane0.hi),
    )
    total = _sum_lanes(state)
    return gl.add(gl.mul(diag, state), _expand(total, (..., None)))


@jax.jit
def poseidon2_permute(state: GL) -> GL:
    """Permute a GL array of shape (..., 12); batched over leading dims.

    Uses lax.scan over rounds so the compiled graph stays small; the jit
    wrapper deduplicates the traced body across call sites with the same
    batch shape (several Merkle/transcript stages reuse one instance)."""
    assert state.shape[-1] == WIDTH
    rc_ext = _rc_ext()
    rc_mid = _rc_mid()
    diag = _diag()

    state = _matmul_external(state)

    def ext_body(s, rc_row):
        return _external_round(s, rc_row), None

    def int_body(s, rc):
        return _internal_round(s, rc, diag), None

    state, _ = jax.lax.scan(ext_body, state, rc_ext[:ROUND_F_BEGIN])
    state, _ = jax.lax.scan(int_body, state, rc_mid)
    state, _ = jax.lax.scan(ext_body, state, rc_ext[ROUND_F_BEGIN:ROUND_F_END])
    return state


# Back-compat alias (poseidon2_permute is itself jitted).
poseidon2_permute_jit = poseidon2_permute


# Read once at import: poseidon2_permute_auto is called at TRACE time inside
# jitted callers (e.g. ops.mmcs._build_tree), so a call-time environ read
# would be silently frozen by the jit cache after the first compile per
# shape.  The escape hatch is therefore process-start-only, and documented
# as such.
import os as _os

PALLAS_DISABLED = bool(_os.environ.get("P25_DISABLE_PALLAS"))


def poseidon2_permute_auto(state: GL) -> GL:
    """Backend-aware dispatch: the fused Pallas kernel on TPU for real
    batches, the scan-based jnp path otherwise (CPU tests, tiny batches,
    or P25_DISABLE_PALLAS=1 — read at process start, see PALLAS_DISABLED).

    Used by batch-hash call sites with concrete (non-vmapped) shapes — the
    prover's Merkle tree construction is the main one."""
    b = 1
    for d in state.shape[:-1]:
        b *= int(d)
    if (not PALLAS_DISABLED
            and b >= 128 and jax.default_backend() == "tpu"):
        from .pallas import poseidon2_permute_pallas
        return poseidon2_permute_pallas(state)
    return poseidon2_permute(state)
