"""Pallas TPU kernels for the hot ops (SURVEY.md §7 design stance).

The reference's native Rust kernels (gates' witness generators,
src/common/poseidon2/poseidon2.rs:59-91) map here to fused Pallas kernels:
the full computation runs out of VMEM with one HBM read + one HBM write per
element, instead of XLA's per-round scan materialization.
"""

from .poseidon2_pallas import poseidon2_permute_pallas

__all__ = ["poseidon2_permute_pallas"]
