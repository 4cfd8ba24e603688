"""Device-resident duplex challenger for the prover's Fiat-Shamir transcript.

Same duplex semantics as the int oracle (refimpl/challenger.py, mirroring
src/p3/challenger.rs with its two bit-exactness quirks: input buffer fills
to WIDTH=12 before duplexing, and `sample` pops from the BACK of the output
buffer) — but every value is a device scalar and every duplex is one jitted
permutation.  The prover's transcript thereby stays on device end-to-end:
tree roots feed observes and sampled challenges feed the next stage with NO
device->host synchronization until final proof assembly.  (The host-pull
variant blocked on every phase's Merkle root — one tunnel round trip per
FRI phase.)

Buffer STATE (fill counts, pop positions) is host-side Python — it depends
only on the call schedule, never on field values, so control flow stays
static and traceable.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import numpy as np

from ..constants import WIDTH
from ..fields import gl
from ..fields.extension import GL2
from ..fields.goldilocks import GL
from ..ops.poseidon2 import poseidon2_permute

_permute_j = jax.jit(poseidon2_permute)


@jax.jit
def _duplex_with(state: GL, head: GL) -> GL:
    """Overwrite the first head-width lanes with `head`, then permute.

    state: GL (*batch, 12); head: GL (*batch, k)."""
    k = head.shape[-1]
    return _permute_j(gl.concatenate([head, state[..., k:]], axis=-1))


class DeviceChallenger:
    """Duplex challenger over device values.

    Scalar by default (values of shape ()); pass batch=(B,) for B parallel
    transcripts advancing in lockstep (the batch prover) — every observe /
    sample then takes/returns GL arrays of that batch shape."""

    def __init__(self, batch=()):
        self.batch = tuple(batch)
        self.state: GL = gl.zeros((*self.batch, WIDTH))
        self.input_buffer: List[GL] = []      # GL (*batch,) values
        self._out_avail: int = 0              # entries of `state` still poppable

    def _duplex(self):
        assert len(self.input_buffer) <= WIDTH
        if self.input_buffer:
            head = gl.stack(self.input_buffer, axis=-1)   # (*batch, k)
            self.input_buffer = []
            self.state = _duplex_with(self.state, head)
        else:
            self.state = _permute_j(self.state)
        self._out_avail = WIDTH

    def observe(self, value: GL):
        """value: GL (*batch,)."""
        self._out_avail = 0
        self.input_buffer.append(value)
        if len(self.input_buffer) == WIDTH:
            self._duplex()

    def observe_many(self, values: GL):
        """values: GL (*batch, k) — k lane-values observed in order."""
        for i in range(values.shape[-1]):
            self.observe(values[..., i])

    def sample(self) -> GL:
        if self.input_buffer or not self._out_avail:
            self._duplex()
        self._out_avail -= 1
        return self.state[..., self._out_avail]

    def sample_ext(self) -> GL2:
        return GL2(self.sample(), self.sample())

    def sample_bits(self, bits: int):
        """-> uint32 device value of the batch shape (bits <= 32)."""
        assert bits <= 32
        v = self.sample()
        return v.lo & np.uint32((1 << bits) - 1)

    def sample_many_bits(self, n: int, bits: int):
        """Sample n values masked to `bits` bits in ONE jitted dispatch
        (static schedule: drain the remaining output entries, then duplex
        as needed).  -> (*batch, n) uint32 device array."""
        assert bits <= 32 and not self.input_buffer
        avail = self._out_avail
        n_duplex = 0
        need = n - avail
        while need > 0:
            n_duplex += 1
            need -= WIDTH

        state, out = _sample_many(self.state, avail, n_duplex, n)
        self.state = state
        self._out_avail = (avail + n_duplex * WIDTH) - n
        return out & np.uint32((1 << bits) - 1)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _sample_many(state: GL, avail: int, n_duplex: int, n: int):
    outs = []
    for i in range(avail - 1, -1, -1):
        outs.append(state[..., i])
    for _ in range(n_duplex):
        state = poseidon2_permute(state)
        for i in range(WIDTH - 1, -1, -1):
            outs.append(state[..., i])
    return state, gl.stack(outs[:n], axis=-1).lo
