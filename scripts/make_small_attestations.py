"""Generate artifacts/attestation_small.json: small attestation bundles
(single + attest_many aggregate) over fib(8) proofs, used by
`__graft_entry__.dryrun_multichip`'s attestation leg — pre-built here (on
TPU, where the 618-wide VerifierAir STARK proves in seconds) so the
dryrun only exercises the CHECK side on the virtual mesh."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import plonky25_tpu.attest as A                                 # noqa: E402
from plonky25_tpu.models.fibonacci import (                     # noqa: E402
    FibonacciAir,
    fibonacci_trace,
)
from plonky25_tpu.proof import FriConfig, proof_to_json         # noqa: E402
from plonky25_tpu.refimpl.prover import prove as refimpl_prove  # noqa: E402

FC = FriConfig(log_blowup=1, num_queries=2, proof_of_work_bits=1)
ATT_FC = FriConfig(log_blowup=1, num_queries=2, proof_of_work_bits=1)
OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "attestation_small.json")


def main():
    # --oracle: int-oracle prover/verifier (CPU boxes; the device prover
    # compiles the 620-wide modules, minutes-long off-TPU)
    oracle = "--oracle" in sys.argv
    dev = not oracle
    air = FibonacciAir()
    p1 = refimpl_prove(air, fibonacci_trace(8), FC)
    p2 = refimpl_prove(air, fibonacci_trace(16), FC)
    bundle = A.attest(p1, air, FC, att_fri_config=ATT_FC,
                      use_device_prover=dev)
    assert A.check_attestation(bundle, p1, air, FC, att_fri_config=ATT_FC,
                               use_device_verifier=dev)
    multi = A.attest_many([p1, p2], air, FC, att_fri_config=ATT_FC,
                          use_device_prover=dev)
    assert A.check_attestations(multi, [p1, p2], air, FC,
                                att_fri_config=ATT_FC,
                                use_device_verifier=dev)
    blob = {
        "fc": {"log_blowup": FC.log_blowup, "num_queries": FC.num_queries,
               "proof_of_work_bits": FC.proof_of_work_bits},
        "att_fc": {"log_blowup": ATT_FC.log_blowup,
                   "num_queries": ATT_FC.num_queries,
                   "proof_of_work_bits": ATT_FC.proof_of_work_bits},
        "proofs": [proof_to_json(p1), proof_to_json(p2)],
        "bundle": A.bundle_to_json(bundle),
        "multi": A.bundle_to_json(multi),
    }
    with open(OUT, "w") as f:
        json.dump(blob, f)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
