"""Query-sharded proof verification (SURVEY.md §2.3 deliverable 2).

Strategy (SURVEY.md §7 step 6): the transcript is inherently sequential but
tiny (~20 duplexings), so it is REPLICATED - replayed identically on every
device - rather than communicated; the per-query work (Merkle batch
openings, reduced openings, FRI fold: verifier.rs:266-344, 419-519) is
sharded over a 1-D "q" device mesh, padding the query axis to a device
multiple by repeating query 0 (a valid opening, so padded lanes cannot
flip the verdict).  The final verdict is a sharded all-reduce that the XLA
SPMD partitioner lowers onto ICI.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..air import Air
from ..fields import gl, gl2
from ..fields.extension import GL2
from ..fields.goldilocks import GL
from ..proof import FriConfig, P3Config, Proof, derive_config
from ..verifier import TpuVerifier, VerifyResult, _publics_device, get_verifier
from ..witness import pack_witness
from .mesh import make_mesh, query_shardings


def _pad_axis(x, axis: int, target: int):
    """Pad `axis` to length `target` by repeating the first slice."""
    n = x.shape[axis]
    if n == target:
        return x
    reps = target - n
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    pad = jnp.concatenate([first] * reps, axis=axis)
    return jnp.concatenate([x, pad], axis=axis)


def _pad_tree(t, axis: int, target: int):
    return jax.tree.map(lambda a: _pad_axis(a, axis, target), t)


class ShardedVerifier:
    """Wraps a shape-specialized TpuVerifier with a query-sharded execution
    plan over a device mesh."""

    def __init__(self, air: Air, config: P3Config, mesh: Optional[Mesh] = None):
        self.base = get_verifier(air, config)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_dev = int(np.prod(self.mesh.devices.shape))
        self.shardings = query_shardings(self.mesh, self.mesh.axis_names[0])
        Q = config.fri_config.num_queries
        self.Q_pad = ((Q + self.n_dev - 1) // self.n_dev) * self.n_dev

    def _place(self, w: Dict):
        """Pad query axes and place arrays with their shardings."""
        s = self.shardings
        put = jax.device_put
        out = dict(w)
        out["batch_values"] = [
            put(_pad_tree(v, 0, self.Q_pad), s["vals"]) for v in w["batch_values"]
        ]
        out["batch_sibs"] = [
            put(_pad_tree(v, 0, self.Q_pad), s["sibs"]) for v in w["batch_sibs"]
        ]
        out["fold_sibling_values"] = put(
            _pad_tree(w["fold_sibling_values"], 1, self.Q_pad), s["lq"]
        )
        out["fold_sibs"] = put(_pad_tree(w["fold_sibs"], 1, self.Q_pad), s["lq_sibs"])
        for k in ("obs", "trace_local", "trace_next", "quotient_chunks",
                  "final_poly", "stage2_local", "stage2_next"):
            if k in w:
                out[k] = put(w[k], s["rep"])
        return out

    def verify_witness(self, w: Dict) -> VerifyResult:
        v = self.base
        w = self._place(w)

        # transcript: replicated (inputs replicated => stage replicated)
        t = v._s_transcript(w["obs"])
        index = jax.device_put(
            _pad_axis(t["index"], 0, self.Q_pad), self.shardings["idx"]
        )

        commits = [t["trace_commit"]]
        if v.s2w:
            commits.append(t["stage2_commit"])
        commits.append(t["quotient_commit"])
        merkle_ok = v._s_batch_all(index, tuple(w["batch_values"]),
                                   tuple(w["batch_sibs"]), tuple(commits))
        merkle_all_ok = jnp.all(merkle_ok)

        ro_stack = v._s_ro(
            index, t["zeta"], t["zeta_next"], t["alpha_fri"],
            tuple(w["batch_values"]),
            w["trace_local"], w["trace_next"], w["quotient_chunks"],
            w.get("stage2_local"), w.get("stage2_next"),
        )

        fold_ok = v._s_fold(index, t["phase_commits"], t["betas_stack"],
                            w["fold_sibling_values"], ro_stack,
                            w["fold_sibs"], w["final_poly"])

        quotient_ok = v._s_final(t["alpha"], t["zeta"], w["trace_local"],
                                 w["trace_next"], w["quotient_chunks"],
                                 _publics_device(v.air),
                                 w.get("stage2_local"), w.get("stage2_next"),
                                 t.get("challenges"))

        ok = t["pow_ok"] & merkle_all_ok & fold_ok & quotient_ok
        return VerifyResult(
            ok=ok, pow_ok=t["pow_ok"], merkle_ok=merkle_all_ok, fold_ok=fold_ok,
            quotient_ok=quotient_ok, shape_ok=True,
            alpha=t["alpha"], zeta=t["zeta"], query_indices=index,
        )

    def verify(self, proof: Proof) -> VerifyResult:
        if not self.base.check_shape(proof):
            f = jnp.asarray(False)
            return VerifyResult(ok=f, pow_ok=f, merkle_ok=f, fold_ok=f,
                                quotient_ok=f, shape_ok=False)
        return self.verify_witness(pack_witness(proof, self.base.config))


def verify_proof_sharded(proof: Proof, air: Air, fri_config: FriConfig,
                         mesh: Optional[Mesh] = None) -> VerifyResult:
    config = derive_config(proof, fri_config)
    return ShardedVerifier(air, config, mesh).verify(proof)
