"""Duplex challenger for TPU: static schedule + one-scan transcript.

The reference challenger (src/p3/challenger.rs) is inherently sequential:
every observation mutates a sponge and every challenge pops sponge output.
Running it op-by-op on device would put ~20 separate permutation subgraphs
into the compiled program.  Instead we split it:

  1. `SymbolicChallenger` replays the verifier's observe/sample sequence at
     *trace time* with token values, recording, for each duplex step, which
     observation indices overwrite which state lanes, and for each sample,
     which (step, lane) of the permuted states it reads.  The schedule
     depends only on the proof *shape* - never on values - because
     observation/sample counts are shape-derived.
  2. `run_transcript` executes the whole transcript on device as a single
     `lax.scan` over duplex steps (ONE permutation body), then gathers all
     challenges with static indices.

Bit-exactness quirks preserved (SURVEY.md §7 step 3): the input buffer
fills to WIDTH=12 before duplexing (challenger.rs:91-93), `sample` pops
from the BACK of the output buffer (challenger.rs:114-116), and `observe`
clears pending outputs (challenger.rs:88).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from .constants import WIDTH
from .fields import gl
from .fields.goldilocks import GL
from .ops.poseidon2 import poseidon2_permute
import jax


@dataclass
class SymbolicChallenger:
    """Trace-time replay of challenger.rs recording a static schedule."""

    n_obs: int = 0
    n_samples: int = 0
    # per duplex step: list of observation indices writing lanes 0..k-1
    steps: List[List[int]] = field(default_factory=list)
    # per sample: (duplex_step, lane) it reads
    sample_srcs: List[Tuple[int, int]] = field(default_factory=list)

    _input_buffer: List[int] = field(default_factory=list)
    _output_tokens: List[Tuple[int, int]] = field(default_factory=list)

    def _duplex(self):
        assert len(self._input_buffer) <= WIDTH
        self.steps.append(list(self._input_buffer))
        self._input_buffer.clear()
        step = len(self.steps) - 1
        self._output_tokens = [(step, lane) for lane in range(WIDTH)]

    def observe(self, n: int = 1) -> List[int]:
        """Observe n values; returns their observation indices (the caller
        binds them to proof fields in the same order at runtime)."""
        ids = []
        for _ in range(n):
            self._output_tokens.clear()
            idx = self.n_obs
            self.n_obs += 1
            ids.append(idx)
            self._input_buffer.append(idx)
            if len(self._input_buffer) == WIDTH:
                self._duplex()
        return ids

    def sample(self) -> int:
        """Sample one challenge; returns its index into the runtime
        challenge vector (sample order)."""
        if self._input_buffer or not self._output_tokens:
            self._duplex()
        src = self._output_tokens.pop()
        self.sample_srcs.append(src)
        s = self.n_samples
        self.n_samples += 1
        return s

    def sample_ext(self) -> Tuple[int, int]:
        return self.sample(), self.sample()

    # ------------------------------------------------------------ schedule
    def schedule(self):
        """Static numpy arrays for the device transcript."""
        n_steps = len(self.steps)
        write_idx = np.full((n_steps, WIDTH), -1, np.int32)
        for s, obs_ids in enumerate(self.steps):
            for lane, obs_id in enumerate(obs_ids):
                write_idx[s, lane] = obs_id
        steps_arr = np.asarray([s for s, _ in self.sample_srcs], np.int32)
        lanes_arr = np.asarray([l for _, l in self.sample_srcs], np.int32)
        return write_idx, steps_arr, lanes_arr


def run_transcript(schedule, observations: GL) -> GL:
    """Execute the transcript on device.

    schedule: output of SymbolicChallenger.schedule().
    observations: GL (n_obs,) in observation order.
    Returns challenges: GL (n_samples,) in sample order."""
    write_idx, steps_arr, lanes_arr = schedule
    write_idx_j = jnp.asarray(write_idx)
    mask = write_idx_j >= 0
    gathered = observations[jnp.clip(write_idx_j, 0, None)]  # (n_steps, 12)

    def body(state, xs):
        row, m = xs
        state = gl.select(m, row, state)
        state = poseidon2_permute(state)
        return state, state

    init = gl.zeros((WIDTH,))
    _, outs = jax.lax.scan(body, init, (gathered, mask))  # (n_steps, 12)
    return outs[jnp.asarray(steps_arr), jnp.asarray(lanes_arr)]
