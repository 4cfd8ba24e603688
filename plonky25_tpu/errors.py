"""Typed error surface (reference: FriError, src/p3/serde/fri.rs:16-21).

The reference's verifier panics on malformed proofs except for one typed
path — `FriError::InvalidProofShape` when the query count disagrees with
the config (src/p3/verifier.rs:372-374).  Here, shape problems raise
`InvalidProofShape` from `check_proof_shape` (host-side, before any device
work), and proof-VALUE problems never raise: they turn into a False verdict
with per-stage flags on `VerifyResult` (soundness checks must not be
bypassable by exceptions).
"""

from __future__ import annotations


class P25Error(Exception):
    """Base class for plonky2.5-tpu errors."""


class FriError(P25Error):
    """FRI-level verification errors (serde/fri.rs:16-21)."""


class InvalidProofShape(FriError):
    """Proof tree shape disagrees with the derived config
    (verifier.rs:126-133, 372-374)."""


class InvalidPowWitness(FriError):
    """Proof-of-work witness fails the grind check (challenger.rs:159-169).

    Only raised by strict APIs; the batched verifier reports it in
    VerifyResult.pow_ok instead."""


def check_proof_shape(proof, config) -> None:
    """Raise InvalidProofShape unless `proof` matches `config`.

    Mirrors the reference's shape validation: the panic block at
    verifier.rs:126-133 (opened-value widths vs. AIR/quotient shape) and
    the typed query-count check at verifier.rs:372-374."""
    from .constants import EXT_DEGREE

    ov = proof.opened_values
    fc = config.fri_config
    q = len(proof.opening_proof.fri_proof.query_proofs)
    if q != fc.num_queries:
        raise InvalidProofShape(
            f"proof has {q} query proofs, config expects {fc.num_queries}")
    if len(ov.trace_local) != config.trace_width:
        raise InvalidProofShape(
            f"trace_local width {len(ov.trace_local)} != AIR width "
            f"{config.trace_width}")
    if len(ov.trace_next) != config.trace_width:
        raise InvalidProofShape(
            f"trace_next width {len(ov.trace_next)} != AIR width "
            f"{config.trace_width}")
    if len(ov.quotient_chunks) != 1 << config.log_quotient_degree:
        raise InvalidProofShape(
            f"{len(ov.quotient_chunks)} quotient chunks, expected "
            f"{1 << config.log_quotient_degree}")
    for i, qc in enumerate(ov.quotient_chunks):
        if len(qc) != EXT_DEGREE:
            raise InvalidProofShape(
                f"quotient chunk {i} has {len(qc)} values, expected "
                f"{EXT_DEGREE}")
    if len(proof.opening_proof.query_openings) != fc.num_queries:
        raise InvalidProofShape(
            f"{len(proof.opening_proof.query_openings)} query openings, "
            f"expected {fc.num_queries}")
