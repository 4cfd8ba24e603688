"""Device-resident challenger: bit-exact vs the int oracle on random
interleaved schedules (refimpl/challenger.py semantics, challenger.rs)."""

import numpy as np

from plonky25_tpu.fields import gl
from plonky25_tpu.prover.device_challenger import DeviceChallenger
from plonky25_tpu.refimpl.challenger import DuplexChallenger

P = (1 << 64) - (1 << 32) + 1


def test_matches_oracle_on_random_schedule(rng):
    ref = DuplexChallenger()
    dev = DeviceChallenger()
    for step in range(50):
        op = rng.choice(["obs1", "obs4", "sample", "ext"])
        if op == "obs1":
            v = rng.randrange(P)
            ref.observe(v)
            dev.observe(gl.from_u64([v])[0])
        elif op == "obs4":
            vs = [rng.randrange(P) for _ in range(4)]
            ref.observe_many(vs)
            dev.observe_many(gl.from_u64(vs))
        elif op == "sample":
            assert ref.sample() == int(gl.to_u64(dev.sample())), step
        else:
            e = dev.sample_ext()
            got = (int(gl.to_u64(e.c0)), int(gl.to_u64(e.c1)))
            assert ref.sample_ext() == got, step


def test_sample_many_bits_matches_oracle(rng):
    ref = DuplexChallenger()
    dev = DeviceChallenger()
    vs = [rng.randrange(P) for _ in range(5)]
    ref.observe_many(vs)
    dev.observe_many(gl.from_u64(vs))
    # leave a partially-drained output buffer before the batch
    assert ref.sample() == int(gl.to_u64(dev.sample()))
    want = [ref.sample_bits(7) for _ in range(100)]
    got = [int(x) for x in np.asarray(dev.sample_many_bits(100, 7))]
    assert want == got
    # transcript state must continue identically after the batch
    assert ref.sample() == int(gl.to_u64(dev.sample()))
