"""Device mesh / topology module (SURVEY.md §2.3 deliverable 1).

The reference has no parallel layer at all; this is the TPU-native
replacement: a 1-D "q" (query) mesh for data-parallel FRI query
verification within a slice, optionally extended with a leading "b"
(proof-batch) axis for multi-host batch aggregation (BASELINE config 5).
Collectives are inserted by the XLA SPMD partitioner from sharding
annotations - we never hand-write them for this embarrassingly
query-parallel workload.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None,
              axis_name: str = "q") -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_batch_mesh(n_batch: int, n_query: int, devices=None) -> Mesh:
    """2-D (proof-batch x query) mesh for multi-proof aggregation."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_batch * n_query
    arr = np.asarray(devices[: n_batch * n_query]).reshape(n_batch, n_query)
    return Mesh(arr, ("b", "q"))


def query_shardings(mesh: Mesh, axis_name: str = "q"):
    """Shardings used by the query-parallel verifier stages.

    Returns (by_query_axis0, by_query_axis1, replicated):
      - axis0: arrays whose leading axis is the query axis (index,
        batch_values (Q, rows, len), batch_sibs (Q, D, 4))
      - axis1: arrays with a leading level axis then queries
        (fold_sibling_values (L, Q), fold_sibs (L, Q, D, 4), ro (L, Q))
      - replicated: everything else (commitments, opened values, scalars)
    """
    q0 = NamedSharding(mesh, P(axis_name))
    q0_r = NamedSharding(mesh, P(axis_name, None, None))
    q1 = NamedSharding(mesh, P(None, axis_name))
    q1_r = NamedSharding(mesh, P(None, axis_name, None, None))
    rep = NamedSharding(mesh, P())
    return {"idx": q0, "vals": q0_r, "sibs": q0_r,
            "lq": q1, "lq_sibs": q1_r, "rep": rep}
