"""Pallas kernel tests.

The full 30-round fused kernel is validated bit-exactly against the jnp path
on real TPU hardware (the interpret-mode emulation of the whole unrolled
kernel takes tens of minutes to compile on this 1-CPU machine, so it is
TPU-gated here; scripts/tpu_pallas_check.py runs the same check standalone).
CPU coverage: each kernel building block (external MDS mixing, S-box,
internal round) runs as its own tiny interpret-mode pallas_call and must
match the jnp reference path exactly.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plonky25_tpu.fields import gl
from plonky25_tpu.fields.goldilocks import GL
from plonky25_tpu.ops import poseidon2 as p2
from plonky25_tpu.ops.pallas import poseidon2_pallas as pp

B = 128


def _rand_state(rng, b=B):
    vals = np.asarray(
        [rng.randrange(0, (1 << 64) - (1 << 32) + 1) for _ in range(b * 12)],
        dtype=object,
    ).reshape(b, 12)
    return gl.from_u64(vals)


def _cols(state: GL) -> tuple:
    """(B, 12) GL -> transposed (12, B) uint32 pair."""
    return state.lo.T, state.hi.T


def _from_cols(lo, hi) -> GL:
    return GL(lo.T, hi.T)


def _run_block_kernel(body, state: GL):
    """Run body((12,B) GL -> (12,B) GL) as an interpret-mode pallas kernel."""
    lo, hi = _cols(state)
    consts = pp._round_constant_arrays()
    spec = pl.BlockSpec(lo.shape, lambda: (0, 0), memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec(c.shape, lambda: (0, 0), memory_space=pltpu.VMEM)
        for c in consts
    ]
    osh = jax.ShapeDtypeStruct(lo.shape, jnp.uint32)

    def kernel(lo_ref, hi_ref, rce_lo, rce_hi, rcm_lo, rcm_hi, dg_lo, dg_hi,
               out_lo, out_hi):
        s = body(GL(lo_ref[:], hi_ref[:]),
                 GL(rce_lo[:], rce_hi[:]),
                 GL(rcm_lo[:], rcm_hi[:]),
                 GL(dg_lo[:], dg_hi[:]))
        out_lo[:] = s.lo
        out_hi[:] = s.hi

    out = pl.pallas_call(
        kernel,
        in_specs=[spec, spec] + const_specs,
        out_specs=(spec, spec),
        out_shape=(osh, osh),
        interpret=True,
    )(lo, hi, *consts)
    return _from_cols(*out)


def test_matmul_external_matches_jnp(rng):
    x = _rand_state(rng)
    want = gl.to_u64(p2._matmul_external(x))
    got = gl.to_u64(_run_block_kernel(
        lambda s, rce, rcm, dg: pp._matmul_external(s), x))
    assert (want == got).all()


def test_sbox_matches_jnp(rng):
    x = _rand_state(rng)
    want = gl.to_u64(p2._sbox(x))
    got = gl.to_u64(_run_block_kernel(
        lambda s, rce, rcm, dg: pp._sbox(s), x))
    assert (want == got).all()


def test_external_round_matches_jnp(rng):
    x = _rand_state(rng)
    rc_row = p2._rc_ext()[0]
    want = gl.to_u64(p2._external_round(x, rc_row))

    def body(s, rce, rcm, dg):
        rc = GL(rce.lo[:, 0:1], rce.hi[:, 0:1])
        return pp._matmul_external(pp._sbox(gl.add(s, rc)))

    got = gl.to_u64(_run_block_kernel(body, x))
    assert (want == got).all()


def test_internal_round_matches_jnp(rng):
    x = _rand_state(rng)
    want = gl.to_u64(p2._internal_round(x, p2._rc_mid()[0], p2._diag()))

    def body(s, rce, rcm, dg):
        rc = GL(rcm.lo[:, 0:1], rcm.hi[:, 0:1])
        lane0 = pp._sbox(gl.add(s[0:1], rc))
        s = gl.concatenate([lane0, s[1:12]], axis=0)
        total = pp._sum_rows(s)
        return gl.add(gl.mul(dg, s), gl.broadcast_to(total, s.shape))

    got = gl.to_u64(_run_block_kernel(body, x))
    assert (want == got).all()


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="full fused kernel is compiled for TPU; "
                           "interpret-mode compile is pathological on 1 CPU")
def test_full_kernel_matches_jnp_on_tpu(rng):
    from plonky25_tpu.ops.pallas import poseidon2_permute_pallas

    x = _rand_state(rng, 300)
    want = gl.to_u64(p2.poseidon2_permute(x))
    got = gl.to_u64(poseidon2_permute_pallas(x))
    assert (want == got).all()


def test_auto_dispatch_falls_back_on_cpu(rng):
    # On the CPU test backend the dispatcher must use the jnp path.
    x = _rand_state(rng, 130)
    want = gl.to_u64(p2.poseidon2_permute(x))
    got = gl.to_u64(p2.poseidon2_permute_auto(x))
    assert (want == got).all()
