from .poseidon2 import poseidon2_permute  # noqa: F401
