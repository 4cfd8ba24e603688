"""Fused Pallas TPU kernel: batched Poseidon2 width-12 permutation.

The jnp path (ops/poseidon2.py) expresses the permutation as a lax.scan of
round bodies, which XLA compiles to ~30 fused loop iterations with the state
round-tripping through loop-carried buffers.  This kernel fuses the ENTIRE
permutation (external/internal/external rounds, S-boxes, MDS-lite mixing)
into one Pallas program: the state is read from HBM once, lives in
VMEM/registers for all 30 rounds, and is written back once — the TPU
equivalent of the reference's native per-gate permutation kernel
(src/common/poseidon2/poseidon2.rs:59-91, constants
src/common/poseidon2/poseidon2_goldilocks.rs:11-164).

Layout: the (batch, 12) state is transposed to (12, B) so the batch axis
rides the 128-wide VPU lanes and the 12 state lanes become sublane rows that
static row-slices address for the M4 block mixing.  All Goldilocks
arithmetic is the same planar 2xu32-limb code as the jnp path
(fields/goldilocks.py — shape-agnostic, runs inside kernel bodies).

Bit-exactness is asserted against the jnp path (itself validated against the
golden artifact) in tests/test_poseidon2.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import (
    GOLDILOCKS_P as P,
    WIDTH,
    ROUND_F_BEGIN,
    ROUND_F_END,
    MAT_DIAG_M_1,
    RC,
    RC_MID,
)
from ...fields import gl
from ...fields.goldilocks import GL

U32 = jnp.uint32


def _const_planar(values, shape):
    """Python ints -> (lo, hi) numpy uint32 arrays of the given shape."""
    vals = [int(v) % P for v in np.asarray(values, object).reshape(-1)]
    lo = np.asarray([v & 0xFFFFFFFF for v in vals], np.uint32).reshape(shape)
    hi = np.asarray([v >> 32 for v in vals], np.uint32).reshape(shape)
    return lo, hi


@functools.lru_cache(maxsize=None)
def _round_constant_arrays():
    """Kernel-input constant tables (pallas forbids captured array consts).

    rc_ext: (12, 8) — column r = external-round-r constants;
    rc_mid: (1, 22) — internal-round constants;
    diag:   (12, 1) — MAT_DIAG_M_1 - 1.
    """
    rc_ext = _const_planar(np.asarray(RC, object).T, (WIDTH, ROUND_F_END))
    rc_mid = _const_planar(RC_MID, (1, len(RC_MID)))
    diag = _const_planar([(d - 1) % P for d in MAT_DIAG_M_1], (WIDTH, 1))
    # numpy (not jnp): this cache outlives traces, and jnp.asarray inside a
    # jit would leak a tracer into it.
    return rc_ext + rc_mid + diag


def _sbox(x: GL) -> GL:
    x2 = gl.square(x)
    x4 = gl.square(x2)
    return gl.mul(gl.mul(x, x2), x4)


def _m4(b: GL) -> GL:
    """M4 on a (4, B) row block (poseidon2.rs:185-243 add/double chain)."""
    x0, x1, x2, x3 = b[0:1], b[1:2], b[2:3], b[3:4]
    t0 = gl.add(x0, x1)
    t1 = gl.add(x2, x3)
    t2 = gl.add(t1, gl.double(x1))
    t3 = gl.add(t0, gl.double(x3))
    t4 = gl.add(t3, gl.scale_small(t1, 4))
    t5 = gl.add(t2, gl.scale_small(t0, 4))
    return gl.concatenate([gl.add(t3, t5), t5, gl.add(t2, t4), t4], axis=0)


def _matmul_external(s: GL) -> GL:
    """M_E = circ(2*M4, M4, M4) on (12, B) via 3 row blocks."""
    blocks = [_m4(s[4 * k:4 * k + 4]) for k in range(3)]
    stored = gl.add(gl.add(blocks[0], blocks[1]), blocks[2])  # (4, B)
    return gl.concatenate([gl.add(b, stored) for b in blocks], axis=0)


def _sum_rows(s: GL) -> GL:
    """Sum of the 12 rows -> (1, B)."""
    t = gl.add(gl.add(s[0:4], s[4:8]), s[8:12])  # (4, B)
    return gl.add(gl.add(t[0:1], t[1:2]), gl.add(t[2:3], t[3:4]))


def _kernel(lo_ref, hi_ref, rce_lo, rce_hi, rcm_lo, rcm_hi, dg_lo, dg_hi,
            out_lo_ref, out_hi_ref):
    s = GL(lo_ref[:], hi_ref[:])  # (12, B)
    diag = GL(dg_lo[:], dg_hi[:])  # (12, 1)

    s = _matmul_external(s)

    # Rounds are unrolled with STATIC constant-column slices: Mosaic cannot
    # prove alignment for dynamic lane-dimension slices (pl.ds on dim 1
    # fails with "index in dimension 1 is a multiple of 128"), and static
    # slices let it relayout the (12, R) constant tables at compile time.
    def ext_round(s, r: int):
        rc = GL(rce_lo[:, r:r + 1], rce_hi[:, r:r + 1])  # (12, 1)
        s = _sbox(gl.add(s, rc))
        return _matmul_external(s)

    def int_round(s, r: int):
        rc = GL(rcm_lo[:, r:r + 1], rcm_hi[:, r:r + 1])  # (1, 1)
        lane0 = _sbox(gl.add(s[0:1], rc))
        s = gl.concatenate([lane0, s[1:WIDTH]], axis=0)
        total = _sum_rows(s)
        return gl.add(gl.mul(diag, s), gl.broadcast_to(total, s.shape))

    for r in range(ROUND_F_BEGIN):
        s = ext_round(s, r)
    for r in range(len(RC_MID)):
        s = int_round(s, r)
    for r in range(ROUND_F_BEGIN, ROUND_F_END):
        s = ext_round(s, r)

    out_lo_ref[:] = s.lo
    out_hi_ref[:] = s.hi


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _permute_cols(lo, hi, block_b: int, interpret: bool):
    """lo/hi: (12, Bp) uint32, Bp a multiple of block_b."""
    bp = lo.shape[1]
    grid = (bp // block_b,)
    spec = pl.BlockSpec((WIDTH, block_b), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    consts = _round_constant_arrays()
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for c in consts
    ]
    out_shape = jax.ShapeDtypeStruct((WIDTH, bp), U32)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec, spec] + const_specs,
        out_specs=(spec, spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(lo, hi, *consts)


def poseidon2_permute_pallas(state: GL, block_b: int = 256,
                             interpret: bool | None = None) -> GL:
    """Permute a GL array of shape (..., 12) with the fused Pallas kernel.

    Bit-identical to ops.poseidon2.poseidon2_permute.  `interpret` defaults
    to True off-TPU (CPU tests) and False on TPU."""
    assert state.shape[-1] == WIDTH
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch = state.shape[:-1]
    b = 1
    for d in batch:
        b *= int(d)
    lo = state.lo.reshape(b, WIDTH).T  # (12, B)
    hi = state.hi.reshape(b, WIDTH).T
    bp = -(-b // block_b) * block_b
    if bp != b:
        pad = ((0, 0), (0, bp - b))
        lo = jnp.pad(lo, pad)
        hi = jnp.pad(hi, pad)
    out_lo, out_hi = _permute_cols(lo, hi, block_b, interpret)
    out_lo = out_lo[:, :b].T.reshape(*batch, WIDTH)
    out_hi = out_hi[:, :b].T.reshape(*batch, WIDTH)
    return GL(out_lo, out_hi)


# ---------------------------------------------------------------- SoA form
# The (12, B) layout above tiles the 12 state rows onto 8-sublane tiles
# (12 -> 16 rows padded: 25% waste) and the constant tables force
# relayouts.  The SoA form gives each lane its own (rows, 128) ref — full
# (8, 128) tile utilization, every op elementwise, and the round constants
# become SCALAR immediates baked into the kernel.

def _soa_sbox(x: GL) -> GL:
    x2 = gl.square(x)
    x4 = gl.square(x2)
    return gl.mul(gl.mul(x, x2), x4)


def _soa_m4(b):
    """M4 on a list of four GL blocks."""
    x0, x1, x2, x3 = b
    t0 = gl.add(x0, x1)
    t1 = gl.add(x2, x3)
    t2 = gl.add(t1, gl.double(x1))
    t3 = gl.add(t0, gl.double(x3))
    t4 = gl.add(t3, gl.scale_small(t1, 4))
    t5 = gl.add(t2, gl.scale_small(t0, 4))
    return [gl.add(t3, t5), t5, gl.add(t2, t4), t4]


def _soa_matmul_external(s):
    blocks = [_soa_m4(s[4 * k:4 * k + 4]) for k in range(3)]
    stored = [gl.add(gl.add(blocks[0][i], blocks[1][i]), blocks[2][i])
              for i in range(4)]
    return [gl.add(blocks[k][i], stored[i])
            for k in range(3) for i in range(4)]


def _soa_kernel(*refs):
    in_refs, out_refs = refs[:2 * WIDTH], refs[2 * WIDTH:]
    s = [GL(in_refs[2 * i][:], in_refs[2 * i + 1][:]) for i in range(WIDTH)]

    def rc_gl(v: int) -> GL:
        return GL(jnp.uint32(v & 0xFFFFFFFF), jnp.uint32(v >> 32))

    s = _soa_matmul_external(s)
    n_int = len(RC_MID)

    def ext_round(s, r: int):
        s = [_soa_sbox(gl.add(x, rc_gl(RC[r][i] % P)))
             for i, x in enumerate(s)]
        return _soa_matmul_external(s)

    def int_round(s, r: int):
        lane0 = _soa_sbox(gl.add(s[0], rc_gl(RC_MID[r] % P)))
        s = [lane0] + s[1:]
        t = gl.add(gl.add(gl.add(s[0], s[1]), gl.add(s[2], s[3])),
                   gl.add(gl.add(s[4], s[5]), gl.add(s[6], s[7])))
        total = gl.add(t, gl.add(gl.add(s[8], s[9]), gl.add(s[10], s[11])))
        return [gl.add(gl.mul(x, rc_gl((MAT_DIAG_M_1[i] - 1) % P)), total)
                for i, x in enumerate(s)]

    for r in range(ROUND_F_BEGIN):
        s = ext_round(s, r)
    for r in range(n_int):
        s = int_round(s, r)
    for r in range(ROUND_F_BEGIN, ROUND_F_END):
        s = ext_round(s, r)

    for i in range(WIDTH):
        out_refs[2 * i][:] = s[i].lo
        out_refs[2 * i + 1][:] = s[i].hi


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _permute_soa(planes, block_rows: int, interpret: bool):
    """planes: 24 uint32 arrays (R, 128) — lo/hi interleaved per lane."""
    rows = planes[0].shape[0]
    grid = (rows // block_rows,)
    spec = pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((rows, 128), U32)] * (2 * WIDTH)
    return pl.pallas_call(
        _soa_kernel,
        grid=grid,
        in_specs=[spec] * (2 * WIDTH),
        out_specs=[spec] * (2 * WIDTH),
        out_shape=out_shape,
        interpret=interpret,
    )(*planes)


def poseidon2_permute_pallas_soa(state: GL, block_rows: int = 256,
                                 interpret: bool | None = None) -> GL:
    """SoA-layout fused kernel; bit-identical to poseidon2_permute.

    state (..., 12); the flattened batch is padded to a multiple of
    128*block_rows and each lane/limb becomes a (rows, 128) plane."""
    assert state.shape[-1] == WIDTH
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch = state.shape[:-1]
    b = 1
    for d in batch:
        b *= int(d)
    bp = -(-b // (128 * block_rows)) * (128 * block_rows)
    lo = state.lo.reshape(b, WIDTH)
    hi = state.hi.reshape(b, WIDTH)
    if bp != b:
        lo = jnp.pad(lo, ((0, bp - b), (0, 0)))
        hi = jnp.pad(hi, ((0, bp - b), (0, 0)))
    planes = []
    for i in range(WIDTH):
        planes.append(lo[:, i].reshape(-1, 128))
        planes.append(hi[:, i].reshape(-1, 128))
    outs = _permute_soa(tuple(planes), block_rows, interpret)
    out_lo = jnp.stack([outs[2 * i].reshape(-1) for i in range(WIDTH)],
                       axis=-1)[:b]
    out_hi = jnp.stack([outs[2 * i + 1].reshape(-1) for i in range(WIDTH)],
                       axis=-1)[:b]
    return GL(out_lo.reshape(*batch, WIDTH), out_hi.reshape(*batch, WIDTH))
