"""Multi-host proof-batch aggregation (SURVEY.md §2.3 deliverable 5).

BASELINE config 5: verify a batch of proofs across a TPU pod slice.  The
layout is a 2-D (b, q) mesh — the proof-batch axis "b" spans hosts (its
collectives ride DCN) and the query axis "q" spans the chips within a host
(ICI).  Each proof's FRI queries are verified data-parallel along "q"
exactly as in ShardedVerifier; distinct proofs proceed independently along
"b"; the only cross-host communication is the final verdict reduction
(an all-reduce of one bool per proof), so scaling efficiency is limited
purely by witness-upload bandwidth, not by the compute graph.

The reference has no distributed machinery at all (SURVEY.md §2.3); this
module is the TPU-native replacement.  Multi-process wiring uses
`jax.distributed.initialize` (DCN); in single-process mode the same code
runs over any local mesh, which is how the virtual-device CPU tests and
the driver dry-run exercise it.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..air import Air
from ..proof import FriConfig, P3Config, Proof, derive_config
from ..verifier import _publics_device
from ..witness import pack_witness
from .batch import BatchVerifier, stack_witnesses
from .sharded import _pad_axis, _pad_tree


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Bring up the multi-host runtime (jax.distributed over DCN).

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    args are omitted.  Returns True iff a multi-process runtime was
    initialized (False = single-process mode; all APIs here still work)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    kwargs = {"coordinator_address": coordinator_address}
    num_processes = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else os.environ.get(
        "JAX_PROCESS_ID")
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    return True


def make_host_mesh(n_query: Optional[int] = None, devices=None) -> Mesh:
    """(b, q) mesh: "q" = chips per host (ICI), "b" = the rest (hosts/DCN).

    Default n_query = jax.local_device_count() so "b" aligns with host
    boundaries and the batch collectives ride DCN."""
    if devices is None:
        devices = jax.devices()
    if n_query is None:
        n_query = min(jax.local_device_count(), len(devices))
    if not (0 < n_query <= len(devices)):
        raise ValueError(
            f"n_query={n_query} must be in [1, {len(devices)}] "
            f"(total devices available)")
    if len(devices) % n_query:
        raise ValueError(
            f"n_query={n_query} must divide the device count "
            f"{len(devices)} evenly")
    n_batch = len(devices) // n_query
    arr = np.asarray(devices[: n_batch * n_query]).reshape(n_batch, n_query)
    return Mesh(arr, ("b", "q"))


class MultiHostBatchVerifier:
    """Verify a batch of same-shape proofs over a (b, q) mesh.

    Witness arrays are stacked on a leading proof axis (sharded over "b")
    with each proof's query axis sharded over "q"; the vmapped verifier
    stages then run SPMD and XLA inserts the collectives (an all-gather of
    the replicated transcript inputs plus the final verdict all-reduce)."""

    def __init__(self, air: Air, config: P3Config, mesh: Optional[Mesh] = None):
        self.mesh = mesh if mesh is not None else make_host_mesh()
        assert set(self.mesh.axis_names) == {"b", "q"}, self.mesh.axis_names
        self.bv = BatchVerifier(air, config)
        self.base = self.bv.base
        nb, nq = (int(self.mesh.shape["b"]), int(self.mesh.shape["q"]))
        self.n_batch, self.n_query = nb, nq
        Q = config.fri_config.num_queries
        self.Q_pad = -(-Q // nq) * nq

    def _shardings(self):
        m = self.mesh
        return {
            # (B, Q, ...) arrays
            "bq": NamedSharding(m, P("b", "q")),
            "bq_r2": NamedSharding(m, P("b", "q", None, None)),
            # (B, L, Q, ...) fold arrays
            "blq": NamedSharding(m, P("b", None, "q")),
            "blq_r2": NamedSharding(m, P("b", None, "q", None, None)),
            # per-proof replicated-within-proof arrays
            "b": NamedSharding(m, P("b")),
            "b_rest": NamedSharding(m, P("b", None)),
        }

    def _place(self, ws: Dict) -> Dict:
        """ws: stacked witness pytree with leading proof axis B (a multiple
        of the mesh's "b" extent).  Pads query axes to Q_pad and applies
        the (b, q) shardings."""
        s = self._shardings()
        put = jax.device_put
        out = dict(ws)
        out["batch_values"] = [
            put(_pad_tree(v, 1, self.Q_pad), s["bq_r2"])
            for v in ws["batch_values"]
        ]
        out["batch_sibs"] = [
            put(_pad_tree(v, 1, self.Q_pad), s["bq_r2"])
            for v in ws["batch_sibs"]
        ]
        out["fold_sibling_values"] = put(
            _pad_tree(ws["fold_sibling_values"], 2, self.Q_pad), s["blq"])
        out["fold_sibs"] = put(
            _pad_tree(ws["fold_sibs"], 2, self.Q_pad), s["blq_r2"])
        for k in ("obs", "trace_local", "trace_next", "quotient_chunks",
                  "final_poly", "stage2_local", "stage2_next"):
            if k not in ws:
                continue
            out[k] = jax.tree.map(
                lambda a: put(a, NamedSharding(
                    self.mesh, P(*(("b",) + (None,) * (a.ndim - 1))))),
                ws[k],
            )
        return out

    def verify_witnesses(self, ws: Dict):
        """ws: stacked witness (leading proof axis B).  Returns ok (B,)."""
        v, bv = self.base, self.bv
        ws = self._place(ws)
        t = bv._t(ws["obs"])
        index = jax.device_put(
            _pad_axis(t["index"], 1, self.Q_pad), self._shardings()["bq"])

        commits = [t["trace_commit"]]
        if v.s2w:
            commits.append(t["stage2_commit"])
        commits.append(t["quotient_commit"])
        merkle_ok = bv._b(index, tuple(ws["batch_values"]),
                          tuple(ws["batch_sibs"]), tuple(commits))
        merkle_all_ok = jnp.all(merkle_ok, axis=-1)

        ro_stack = bv._r(
            index, t["zeta"], t["zeta_next"], t["alpha_fri"],
            tuple(ws["batch_values"]),
            ws["trace_local"], ws["trace_next"], ws["quotient_chunks"],
            ws.get("stage2_local"), ws.get("stage2_next"),
        )
        fold_ok = bv._f(
            index, t["phase_commits"], t["betas_stack"],
            ws["fold_sibling_values"], ro_stack, ws["fold_sibs"],
            ws["final_poly"],
        )
        quotient_ok = bv._fin(
            t["alpha"], t["zeta"], ws["trace_local"], ws["trace_next"],
            ws["quotient_chunks"], _publics_device(v.air),
            ws.get("stage2_local"), ws.get("stage2_next"),
            t.get("challenges"),
        )
        return t["pow_ok"] & merkle_all_ok & fold_ok & quotient_ok

    def verify(self, proofs: List[Proof]):
        """Returns (ok (B,) bool on host, all_ok bool) — the aggregate is
        the cross-host reduction (a tiny all-reduce on DCN)."""
        B = len(proofs)
        assert B % self.n_batch == 0, (
            f"batch {B} must be a multiple of the 'b' mesh extent "
            f"{self.n_batch} (pad with duplicate proofs)")
        ws = stack_witnesses(
            [pack_witness(p, self.base.config) for p in proofs])
        ok = self.verify_witnesses(ws)
        return ok, jnp.all(ok)


def verify_proof_batch_multihost(proofs: List[Proof], air: Air,
                                 fri_config: FriConfig,
                                 mesh: Optional[Mesh] = None):
    config = derive_config(proofs[0], fri_config)
    return MultiHostBatchVerifier(air, config, mesh).verify(proofs)
