"""Roofline / MFU accounting for the integer kernels.

BASELINE demands "speed-of-light per chip" per kernel.  The compute path
is u32 VPU arithmetic (no MXU work: Goldilocks ops are elementwise integer
ops), so the roofline is the VPU integer peak:

    v5e TensorCore clock ~= 1.5 GHz (derived: 197 TFLOP/s bf16 peak
    / (4 MXUs x 128x128 MACs x 2 flops) = 1.50e9), VPU shape (8, 128)
    with 4 ALUs per lane slot => 8*128*4 ops/cycle:

        VPU_PEAK_V5E = 8*128*4 * 1.5e9 = 6.1e12 u32 ops/s/chip.

This treats every elementwise u32 op (add, mul-lo, shift, compare,
select, bitwise) as one ALU op — the same accounting the op counter
below uses, so achieved/peak is apples-to-apples.  A 32x32->64 multiply
is two ops in this model only if the code materializes both halves
(ours does, via four 16x16 partial products counted individually).

Op counts come from the traced jaxpr, NOT hand formulas: integer
primitives are counted per element, scan bodies multiply by trip count,
and while-loops (fori_loop lowers to these) are counted once and flagged
— for such kernels the count is a LOWER bound and the MFU an upper
estimate, reported as "mfu_lower_confidence" fields.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import numpy as np

VPU_PEAK_V5E = 8 * 128 * 4 * 1.5e9  # u32 ops/s/chip, see module docstring

# Measured integer ceiling (v5e-1; r2 calibration 2026-08-17, raised r4
# 2026-08-21): VMEM-resident Pallas microkernels running non-collapsible
# u32 recurrences sustain 0.3-0.75 T ops/s on dependent chains; the
# fully-unrolled Poseidon2 kernel (ample ILP across its 108k-op body)
# sustains ~1.7 T ops/s, and the r3 fused batch Merkle walk measured
# 2.006 T ops/s sustained (exact per-shape op count) — the old "~2 T"
# estimate was at/below actually-achievable, so the ceiling is set just
# above the best sustained measurement.  The f32-derived figure above is
# NOT achievable for u32 work on this part — integer ops do not get the
# 4-ALU FMA rate.  MFU is reported against both: `mfu` (vs the
# theoretical bound, pessimistic) and `mfu_vs_u32_ceiling` (vs this
# empirical ceiling, the realistic speed-of-light).  No kernel may
# report >1.0 of this ceiling; if one sustainably does, re-measure and
# raise the ceiling rather than shipping a >100% number.
U32_CEILING_V5E = 2.1e12

# Elementwise integer primitives, one ALU op per output element.
_INT_PRIMS = {
    "add", "sub", "mul", "and", "or", "xor", "not",
    "shift_left", "shift_right_logical", "shift_right_arithmetic",
    "eq", "ne", "lt", "le", "gt", "ge", "min", "max",
    "select_n", "rem", "neg",
}
# Shape/layout plumbing: free on the VPU model (XLA folds these into
# surrounding ops or they are pure data movement).
_FREE_PRIMS = {
    "broadcast_in_dim", "reshape", "transpose", "convert_element_type",
    "squeeze", "concatenate", "slice", "dynamic_slice", "rev",
    "dynamic_update_slice", "gather", "scatter", "iota", "copy",
    "stop_gradient", "pad", "split",
}


@dataclass
class OpCount:
    int_ops: float
    exact: bool  # False if a while-loop body was counted only once


def _size(aval) -> float:
    return float(np.prod(aval.shape)) if aval.shape else 1.0


def _count_jaxpr(jaxpr) -> OpCount:
    total = 0.0
    exact = True
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "scan":
            inner = _count_jaxpr(eqn.params["jaxpr"].jaxpr)
            total += inner.int_ops * eqn.params["length"]
            exact = exact and inner.exact
        elif name == "while":
            inner = _count_jaxpr(eqn.params["body_jaxpr"].jaxpr)
            total += inner.int_ops
            exact = False
        elif name == "cond":
            branches = [_count_jaxpr(b.jaxpr)
                        for b in eqn.params["branches"]]
            total += max(b.int_ops for b in branches)
            exact = exact and all(b.exact for b in branches)
        elif name in ("jit", "pjit", "custom_jvp_call", "custom_vjp_call",
                      "closed_call", "core_call", "remat"):
            inner = _count_jaxpr(eqn.params["jaxpr"].jaxpr)
            total += inner.int_ops
            exact = exact and inner.exact
        elif name in _INT_PRIMS:
            total += sum(_size(v.aval) for v in eqn.outvars)
        elif name in _FREE_PRIMS:
            pass
        else:
            # unknown primitive: charge one op per output element, stay
            # honest about it being a model
            total += sum(_size(v.aval) for v in eqn.outvars)
    return OpCount(total, exact)


def count_int_ops(fn, *args) -> OpCount:
    """Total elementwise-u32 ops of `fn(*args)` from its jaxpr."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    return _count_jaxpr(jaxpr.jaxpr)


def mfu_report(name: str, ops_per_item: OpCount, items_per_sec: float,
               peak: float = VPU_PEAK_V5E) -> dict:
    """MFU-style record: achieved u32 ops/s vs the VPU integer peak."""
    achieved = ops_per_item.int_ops * items_per_sec
    return {
        "kernel": name,
        "u32_ops_per_item": ops_per_item.int_ops,
        "items_per_sec": items_per_sec,
        "achieved_u32_ops_per_sec": achieved,
        "vpu_peak_u32_ops_per_sec": peak,
        "mfu": achieved / peak,
        "u32_ceiling_ops_per_sec": U32_CEILING_V5E,
        "mfu_vs_u32_ceiling": achieved / U32_CEILING_V5E,
        "count_exact": ops_per_item.exact,
    }


def speed_of_light_items_per_sec(ops_per_item: OpCount,
                                 peak: float = VPU_PEAK_V5E) -> float:
    return peak / ops_per_item.int_ops if ops_per_item.int_ops else math.inf
