"""MultisetAir: tagged multiset-equality (permutation) argument.

The scoped prototype for the one remaining recursion-binding step
(docs/SOUNDNESS.md "What would remove even that optional marshal"):
binding the values a VerifierAir trace CONSUMES from its schedule to the
values ABSORBED from the raw target-proof bytes, as a multiset equality
under transcript-sampled challenges.  The reference has the same
capability class in plonky2's copy-constraint permutation argument (the
wire-routing sigma polynomials its `CircuitBuilder` emits under
`/root/reference/src/p3/mod.rs:250-266`'s `build()`); here it is a
STARK-native grand-product over the framework's multi-stage mechanism
(air.py stage2_width/num_challenges/build_stage2), proving on both the
refimpl and device paths.

Statement.  Two streams of (tag, value) pairs — side A: position-tagged
values absorbed from proof bytes; side B: slot-tagged values consumed by
schedule rows — are equal as MULTISETS.  With challenges gamma, delta in
GF(p^2), each pair compresses to `tag + delta * value` and a running
grand product accumulates

    z_i = prod_{j<=i} (gamma - (ta_j + delta * va_j))
                    / (gamma - (tb_j + delta * vb_j)),

so z_{last} == 1 iff the products agree; Schwartz-Zippel over the
challenger-sampled (gamma, delta) makes a disagreeing multiset pass with
probability <= 2(H+1)/|GF(p^2)| (degree H numerator/denominator in
gamma, pair-compression collision in delta).  The challenges are sampled
AFTER the main trace commits, so the prover cannot steer them.

Columns.  Main trace (width 4): ta, va, tb, vb.  Stage 2 (width 2): z as
one GF(p^2) column.  Constraints (max degree 3 incl. selector):

    first row:   z * (gamma - (tb + delta*vb)) = gamma - (ta + delta*va)
    transition:  z' * (gamma - (tb' + delta*vb')) = z * (gamma - (ta' + delta*va'))
    last row:    z = 1

Degenerate-factor caveat: if a sampled gamma ever equals a compressed
pair (probability ~ 2H / |GF(p^2)| ~ 2^-124 per proof), the honest
prover's build_stage2 divides by zero; a production integration would
resample.  The prototype documents rather than handles it.

Padding.  `pad_pairs` right-pads both streams with (0, 0) rows to a
power-of-two height: identical pairs on both sides contribute a ratio of
exactly 1 and leave the argument's meaning unchanged.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from ..air import Air, VerifierConstraintFolder
from ..constants import GOLDILOCKS_P as P
from ..refimpl.field import Gl2


def pad_pairs(side_a: Sequence[Tuple[int, int]],
              side_b: Sequence[Tuple[int, int]],
              min_height: int = 4) -> List[List[int]]:
    """Row-major main trace from two (tag, value) streams, zero-padded to
    a power-of-two height >= max(len, min_height)."""
    if len(side_a) != len(side_b):
        raise ValueError("multiset sides must have equal length "
                         f"({len(side_a)} vs {len(side_b)})")
    h = max(len(side_a), min_height, 1)
    height = 1 << (h - 1).bit_length()
    rows = [[ta % P, va % P, tb % P, vb % P]
            for (ta, va), (tb, vb) in zip(side_a, side_b)]
    rows.extend([[0, 0, 0, 0]] * (height - len(rows)))
    return rows


class MultisetAir(Air):
    def name(self) -> str:
        return "Multiset"

    def width(self) -> int:
        return 4

    def stage2_width(self) -> int:
        return 2  # one GF(p^2) grand-product column as (c0, c1)

    def num_challenges(self) -> int:
        return 2  # gamma (grand-product point), delta (pair compressor)

    def quotient_degree(self) -> int:
        return 2  # max constraint degree 3 (selector * z * linear-factor)

    # -- prover callbacks -------------------------------------------------
    def build_stage2(self, trace, challenges) -> List[List[int]]:
        gamma, delta = challenges
        z = Gl2.ONE
        z0, z1 = [], []
        for ta, va, tb, vb in trace:
            num = Gl2.sub(gamma, Gl2.add_base(Gl2.mul_base(delta, int(va) % P),
                                              int(ta) % P))
            den = Gl2.sub(gamma, Gl2.add_base(Gl2.mul_base(delta, int(vb) % P),
                                              int(tb) % P))
            z = Gl2.mul(z, Gl2.div(num, den))
            z0.append(z[0])
            z1.append(z[1])
        return [z0, z1]

    def build_stage2_device(self, cols, challenges):
        """Device-resident grand product: one lax.scan over rows, the
        challenges never sync to host.  cols: GL (4, H).  Byte-equal to
        build_stage2."""
        import jax

        from ..fields import gl, gl2
        from ..fields.goldilocks import GL

        gamma, delta = challenges

        def compress(tag, val):
            return gl2.sub(gamma, gl2.add_base(gl2.mul_base(delta, val), tag))

        def body(z, row):
            ta, va, tb, vb = row
            z = gl2.mul(z, gl2.mul(compress(ta, va),
                                   gl2.inv(compress(tb, vb))))
            return z, z

        rows = tuple(GL(cols.lo[i], cols.hi[i]) for i in range(4))
        _, zs = jax.lax.scan(body, gl2.ones(()), rows)      # GL2 (H,)
        return gl.stack([zs.c0, zs.c1])                     # (2, H)

    # -- constraints ------------------------------------------------------
    def eval(self, folder: VerifierConstraintFolder) -> None:
        ops = folder.ops
        gamma, delta = folder.challenges

        def compress(tag, val):
            return ops.sub(gamma, ops.add(tag, ops.mul(delta, val)))

        ta, va, tb, vb = folder.main.trace_local
        tan, van, tbn, vbn = folder.main.trace_next
        z = ops.from_parts(*folder.main.stage2_local)
        zn = ops.from_parts(*folder.main.stage2_next)

        folder.when_first_row().assert_eq(
            ops.mul(z, compress(tb, vb)), compress(ta, va))
        folder.when_transition().assert_eq(
            ops.mul(zn, compress(tbn, vbn)),
            ops.mul(z, compress(tan, van)))
        folder.when_last_row().assert_eq(z, ops.one())
