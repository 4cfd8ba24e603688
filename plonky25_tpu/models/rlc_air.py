"""RlcAir: minimal multi-stage AIR (stage-2 fingerprint accumulator).

The smallest AIR exercising the framework's multi-stage commitment
mechanism (air.py Air.stage2_width/num_challenges/build_stage2): a main
trace of two base columns (a, b) and a stage-2 GF(p^2) running
random-linear-combination column

    z_0 = a_0 + gamma * b_0
    z_{i+1} = gamma * z_i + a_{i+1} + gamma * b_{i+1}

where gamma is sampled from the transcript AFTER the main trace is
committed — the Fiat-Shamir pattern behind permutation / lookup /
accumulator arguments (the reference's plonky2 core has the same
capability as its copy-constraint permutation argument; plonky3's
multi-stage uni-stark is the direct analogue).  z is fully determined by
(a, b, gamma) through the first-row + transition constraints, so a proof
binds the stage-2 matrix to the main trace under a challenge the prover
could not predict.
"""

from __future__ import annotations

from typing import List

from ..air import Air, VerifierConstraintFolder
from ..constants import GOLDILOCKS_P as P
from ..refimpl.field import Gl2


class RlcAir(Air):
    def name(self) -> str:
        return "Rlc"

    def width(self) -> int:
        return 2

    def stage2_width(self) -> int:
        return 2  # one GF(p^2) column as two base columns (c0, c1)

    def num_challenges(self) -> int:
        return 1

    def build_stage2(self, trace, challenges) -> List[List[int]]:
        gamma = challenges[0]
        z = Gl2.ZERO
        z0, z1 = [], []
        for row in trace:
            a, b = int(row[0]) % P, int(row[1]) % P
            z = Gl2.add(Gl2.mul(gamma, z),
                        Gl2.add_base(Gl2.mul_base(gamma, b), a))
            z0.append(z[0])
            z1.append(z[1])
        return [z0, z1]

    def build_stage2_device(self, cols, challenges):
        """Device-resident stage-2 builder (TpuProver._stage2_cols): the
        RLC recurrence as one lax.scan over rows — the sampled challenge
        never syncs to host.  cols: GL (2, H); challenges: [GL2 scalar].
        Returns GL (2, H), byte-equal to build_stage2."""
        import jax

        from ..fields import gl, gl2
        from ..fields.extension import GL2
        from ..fields.goldilocks import GL

        gamma = challenges[0]

        def body(z, ab):
            a_i, b_i = ab
            rlc = gl2.add_base(gl2.mul_base(gamma, b_i), a_i)
            z = gl2.add(gl2.mul(gamma, z), rlc)
            return z, z

        a = GL(cols.lo[0], cols.hi[0])
        b = GL(cols.lo[1], cols.hi[1])
        _, zs = jax.lax.scan(body, gl2.zeros(()), (a, b))   # GL2 (H,)
        return gl.stack([zs.c0, zs.c1])                     # (2, H)

    def eval(self, folder: VerifierConstraintFolder) -> None:
        ops = folder.ops
        gamma = folder.challenges[0]
        a, b = folder.main.trace_local
        an, bn = folder.main.trace_next
        z = ops.from_parts(*folder.main.stage2_local)
        zn = ops.from_parts(*folder.main.stage2_next)

        def rlc(aa, bb):
            return ops.add(aa, ops.mul(gamma, bb))

        folder.when_first_row().assert_eq(z, rlc(a, b))
        folder.when_transition().assert_eq(
            zn, ops.add(ops.mul(gamma, z), rlc(an, bn)))
