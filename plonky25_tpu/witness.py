"""Witness packing: proof (host ints) -> padded static-shape device arrays.

The analogue of the reference's `Proof::add_virtual_to` / `set_witness`
(serde/proof.rs:357-383): where the circuit allocated targets by shape, we
allocate padded device arrays by the same shape-derived config; where
`set_witness` bound values to targets, we pack canonical u64 ints into
planar u32 limb arrays (SURVEY.md §7 step 4).

Ragged FRI fold paths (opening_proof length n_phases - i, serde/proof.rs:
204-211) are padded to the max depth with a static validity mask - TPU
needs static shapes (SURVEY.md §7 'Hard parts').
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from .constants import DIGEST_ELEMS
from .fields import gl, gl2
from .fields.goldilocks import GL
from .fields.extension import GL2
from .proof import P3Config, Proof


def _gl(vals) -> GL:
    return gl.from_u64(vals)


def _gl2_list(pairs) -> GL2:
    """List of (c0, c1) -> GL2 with leading axis."""
    return gl2.from_u64_pair([p[0] for p in pairs], [p[1] for p in pairs])


def pack_witness(proof: Proof, config: P3Config) -> Dict:
    """Returns a pytree dict of device arrays; shapes depend only on config."""
    fp = proof.opening_proof.fri_proof
    Q = config.fri_config.num_queries
    n_phases = config.log_trace_height
    path_len = config.opening_matrix_log_max_height

    # ---- observations, in the exact transcript order (verifier.rs:135-139,
    # 363-376): trace commit, quotient commit, per-phase commits, pow witness
    obs: List[int] = []
    obs += proof.commitments.trace.value
    if proof.commitments.stage2 is not None:   # multi-stage AIRs (air.py)
        obs += proof.commitments.stage2.value
    obs += proof.commitments.quotient_chunks.value
    for c in fp.commit_phase_commits:
        obs += c.value
    obs.append(fp.pow_witness)

    # ---- batch openings: values (Q, n_rows, row_len), siblings (Q, D, 4)
    n_batches = len(proof.opening_proof.query_openings[0])
    batch_values = []
    batch_sibs = []
    for b in range(n_batches):
        vals = [
            proof.opening_proof.query_openings[q][b].opened_values
            for q in range(Q)
        ]
        sibs = [
            proof.opening_proof.query_openings[q][b].opening_proof
            for q in range(Q)
        ]
        batch_values.append(_gl(np.asarray(vals, dtype=object)))
        batch_sibs.append(_gl(np.asarray(sibs, dtype=object)))

    # ---- fold phase: sibling values (L, Q) ext, padded paths (L, Q, Dmax, 4)
    sib_c0 = [[fp.query_proofs[q].commit_phase_openings[l].sibling_value[0]
               for q in range(Q)] for l in range(n_phases)]
    sib_c1 = [[fp.query_proofs[q].commit_phase_openings[l].sibling_value[1]
               for q in range(Q)] for l in range(n_phases)]
    fold_sibs = np.zeros((n_phases, Q, n_phases, DIGEST_ELEMS), dtype=object)
    for l in range(n_phases):
        depth = n_phases - l
        for q in range(Q):
            op = fp.query_proofs[q].commit_phase_openings[l].opening_proof
            assert len(op) == depth, "unexpected fold path depth"
            for t in range(depth):
                for e in range(DIGEST_ELEMS):
                    fold_sibs[l, q, t, e] = op[t][e]

    out = {
        "obs": _gl(obs),
        "trace_local": _gl2_list(proof.opened_values.trace_local),
        "trace_next": _gl2_list(proof.opened_values.trace_next),
        "quotient_chunks": GL2(
            _gl(np.asarray([[c[0] for c in ch] for ch in proof.opened_values.quotient_chunks], dtype=object)),
            _gl(np.asarray([[c[1] for c in ch] for ch in proof.opened_values.quotient_chunks], dtype=object)),
        ),
        "batch_values": batch_values,   # list of GL (Q, n_rows, row_len)
        "batch_sibs": batch_sibs,       # list of GL (Q, path_len, 4)
        "fold_sibling_values": gl2.GL2(_gl(sib_c0), _gl(sib_c1)),  # (L, Q)
        "fold_sibs": _gl(fold_sibs),    # (L, Q, Dmax, 4) zero-padded
        "final_poly": gl2.GL2(
            _gl(fp.final_poly[0]), _gl(fp.final_poly[1])
        ),
    }
    if proof.opened_values.stage2_local is not None:
        out["stage2_local"] = _gl2_list(proof.opened_values.stage2_local)
        out["stage2_next"] = _gl2_list(proof.opened_values.stage2_next)
    return out


def fold_valid_mask(config: P3Config) -> np.ndarray:
    """Static (L, Dmax) validity mask for padded fold paths."""
    L = config.log_trace_height
    valid = np.zeros((L, L), dtype=bool)
    for l in range(L):
        valid[l, : L - l] = True
    return valid
