"""Standalone TPU check: fused Pallas Poseidon2 kernel vs jnp scan path.

Run on a machine with a TPU attached (the CPU interpret-mode emulation of
the full unrolled kernel is impractically slow; see tests/test_pallas.py).

    python scripts/tpu_pallas_check.py

Prints bit-exactness and a throughput comparison.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from plonky25_tpu.fields import gl
from plonky25_tpu.fields.goldilocks import GL
from plonky25_tpu.ops.poseidon2 import poseidon2_permute
from plonky25_tpu.ops.pallas import poseidon2_permute_pallas


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    vals = rng.integers(0, (1 << 64) - (1 << 32) + 1, size=(1000, 12),
                        dtype=np.uint64)
    x = gl.from_u64(vals)
    want = gl.to_u64(poseidon2_permute(x))
    got = gl.to_u64(poseidon2_permute_pallas(x))
    ok = bool((want == got).all())
    print("bit-exact match (1000 random states):", ok)
    if not ok:
        sys.exit(1)

    b = 1 << 17
    lo = rng.integers(0, 1 << 32, size=(b, 12), dtype=np.uint64)
    hi = rng.integers(0, (1 << 32) - 1, size=(b, 12), dtype=np.uint64)
    import jax.numpy as jnp
    big = GL(jnp.asarray(lo.astype(np.uint32)), jnp.asarray(hi.astype(np.uint32)))

    for name, f in (("jnp scan", poseidon2_permute),
                    ("pallas", poseidon2_permute_pallas)):
        r = f(big)
        np.asarray(r.lo[0, 0])  # sync
        t = time.time()
        iters = 20
        for _ in range(iters):
            r = f(big)
        np.asarray(r.lo[0, 0])
        dt = (time.time() - t) / iters
        print(f"{name}: {dt * 1e3:.2f} ms / {b} perms = {b / dt / 1e6:.2f} M perms/s")


if __name__ == "__main__":
    main()
