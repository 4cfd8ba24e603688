"""Batched multi-proof verification (BASELINE config 5, single-host part).

Verifies B proofs (same shape config) per device dispatch by vmapping the
verifier stages over a leading proof axis.  This amortizes dispatch
overhead - the dominant cost for a single small proof on the TPU tunnel -
and is the building block for multi-host batch aggregation, where the
proof axis is sharded over hosts and the verdicts are all-reduced.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..air import Air
from ..proof import FriConfig, P3Config, Proof, derive_config
from ..verifier import _publics_device, get_verifier
from ..witness import pack_witness


def stack_witnesses(ws: List[Dict]) -> Dict:
    """Stack per-proof witness pytrees along a new leading proof axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *ws)


def tile_witness(w: Dict, b: int) -> Dict:
    """Tile one witness B times (benchmarking / smoke tests)."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (b,) + x.shape), w
    )


class BatchVerifier:
    """Verify a batch of same-shape proofs with vmapped stages."""

    def __init__(self, air: Air, config: P3Config):
        self.base = get_verifier(air, config)
        v = self.base
        self._t = jax.jit(jax.vmap(v._transcript_fn))
        # the hash-heavy stages flatten (B, Q) into one lane axis instead
        # of vmapping, so the fused Pallas Poseidon2 kernel serves the
        # whole batch as one wide grid (vmap over pallas_call would
        # serialize it; verifier._batched_*_fn)
        self._b = jax.jit(v._batched_batch_all_fn)
        self._r = jax.jit(jax.vmap(v._ro_fn))
        self._f = jax.jit(v._batched_fold_fn)
        # publics broadcast across the proof axis (all proofs share the
        # air); stage-2 matrices and challenges carry a proof axis (None
        # pytrees pass through untouched for single-stage AIRs)
        self._fin = jax.jit(jax.vmap(
            v._final_fn, in_axes=(0, 0, 0, 0, 0, None, 0, 0, 0)))

    def verify_witnesses(self, ws: Dict, with_samples: bool = False):
        """ws: stacked witness (leading proof axis B).  Returns ok (B,) bool;
        with `with_samples`, (ok, samples) where samples is the (B, n) GL
        array of every Fiat-Shamir sample in order (the attestation
        recorder's input — attest_many batches its instrumented
        verifications through here)."""
        t = self._t(ws["obs"])
        index = t["index"]

        commits = [t["trace_commit"]]
        if self.base.s2w:
            commits.append(t["stage2_commit"])
        commits.append(t["quotient_commit"])
        merkle_ok = self._b(index, tuple(ws["batch_values"]),
                            tuple(ws["batch_sibs"]), tuple(commits))
        merkle_all_ok = jnp.all(merkle_ok, axis=-1)

        ro_stack = self._r(
            index, t["zeta"], t["zeta_next"], t["alpha_fri"],
            tuple(ws["batch_values"]),
            ws["trace_local"], ws["trace_next"], ws["quotient_chunks"],
            ws.get("stage2_local"), ws.get("stage2_next"),
        )
        fold_ok = self._f(
            index, t["phase_commits"], t["betas_stack"],
            ws["fold_sibling_values"], ro_stack, ws["fold_sibs"],
            ws["final_poly"],
        )
        quotient_ok = self._fin(
            t["alpha"], t["zeta"], ws["trace_local"], ws["trace_next"],
            ws["quotient_chunks"], _publics_device(self.base.air),
            ws.get("stage2_local"), ws.get("stage2_next"),
            t.get("challenges"),
        )
        ok = t["pow_ok"] & merkle_all_ok & fold_ok & quotient_ok
        if with_samples:
            return ok, t["samples"]
        return ok

    def verify(self, proofs: List[Proof]):
        ws = stack_witnesses([pack_witness(p, self.base.config) for p in proofs])
        return self.verify_witnesses(ws)


def verify_proof_batch(proofs: List[Proof], air: Air, fri_config: FriConfig):
    config = derive_config(proofs[0], fri_config)
    return BatchVerifier(air, config).verify(proofs)
