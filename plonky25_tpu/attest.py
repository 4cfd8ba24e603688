"""Recursive attestation: a STARK proving "this Plonky3 proof verified".

The TPU-native analogue of the reference's whole purpose — building a
plonky2 circuit that re-executes Plonky3 verification and proving it
(`p3_verify_proof` + `data.prove`, /root/reference/src/p3/mod.rs:66-94,261).
There, every verification step becomes circuit constraints; here, the
hash-dominated 95+% of verification (the Fiat-Shamir transcript, every
Merkle batch opening, every FRI fold-level opening — ~2.3k Poseidon2
permutations for the golden fib(64) proof) becomes rows of a HashChainAir
trace proved by the framework's own TpuProver, and the cheap residue (the
reduced-opening / fold interpolation / quotient algebra — pure field ops,
no hashing) is re-executed by the attestation checker.

## Protocol

attest(proof, air, fc) -> AttestationBundle:
  1. Run the reference verification (int oracle, instrumented).  Refuse
     to attest unless it accepts.
  2. Lay out one trace row per Poseidon2 permutation, in canonical order:
     transcript duplexes, then per query (trace batch leaf+path, quotient
     batch leaf+path, then per fold level leaf+path).  Chain columns (m,
     mo, b, selectors) mark which input lanes carry FRESH data (absorbed)
     and which output lanes are EXPOSED (sampled challenges, Merkle roots).
  3. Two running accumulators bind the data:
         acc  = fold over active rows of sum_j m_j * in_j * gamma^j
         acco = fold over active rows of sum_j mo_j * out_j * gamma^j
     for two independent gammas derived by hashing the canonical
     absorbed+exposed sequence.  Their final values are public.
  4. Prove HashChainAir over the trace; bundle {stark, samples, gammas,
     accumulator finals}.

check_attestation(bundle, proof, air, fc):
  1. Re-execute the verification ALGEBRA with the bundled samples injected
     as the Fiat-Shamir challenges and all hashing skipped (refimpl.verify
     with challenger=FakeChallenger, check_merkle=False).
  2. Recompute the canonical accumulators from the proof bytes + bundled
     samples alone (commitments, opened values, path siblings, fold leaf
     evals from step 1) — no hashing except the one gamma digest.
  3. Verify the attestation STARK for HashChainAir with those publics.

## Why this binds

* The transcript chain starts from the zero sponge state (first-row
  constraint) and absorbs exactly the commitments/pow witness the checker
  put into acc — so the exposed samples really are the Fiat-Shamir
  challenges of THESE commitments.
* Every Merkle chain ends by exposing its root into acco, which the
  checker recomputes using the claimed commitments — so the openings hash
  up to the committed roots.
* Every absorbed leaf/sibling value sits in a gamma-slot of acc that the
  checker fills from the same proof bytes its algebra consumed — a prover
  that hashes different values than the algebra used breaks the
  accumulator equality (Schwartz-Zippel over gammas derived by hashing
  the sequence itself, 2 x ~2^64).
* Free witness masks (m, mo, b) cannot cheat: deviating from the
  canonical schedule moves values across gamma-slots and breaks the same
  equality (the compress-row case additionally couples b to content via
  the chaining constraint).

The attestation is most useful in AGGREGATE: one HashChainAir trace can
carry the permutations of a whole batch of verifications, yielding a
single STARK for B proofs (amortized succinctness) — see attest_many.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from .constants import GOLDILOCKS_P as P, RATE, WIDTH
from .errors import P25Error
from .models.poseidon2_air import (
    ACC_OFF,
    ACCO_OFF,
    B_COL,
    CORE_WIDTH,
    M_OFF,
    MO_OFF,
    NUM_HASH_COLS,
    SEL_C,
    SEL_L,
    SEL_T,
    HashChainAir,
)
from .proof import FriConfig, Proof, derive_config
from .refimpl.challenger import DuplexChallenger
from .refimpl.poseidon2 import poseidon2
from .refimpl.verifier import verify as refimpl_verify


class CannotAttest(P25Error):
    """The proof did not verify; refusing to attest."""


@dataclass
class AttestationBundle:
    stark: Proof                  # the attestation STARK proof
    samples: List[int]            # every Fiat-Shamir sample, in order
    gamma: Tuple[int, int]
    acc: Tuple[int, int]
    acc_out: Tuple[int, int]
    att_fri_config: FriConfig
    n_rows: int                   # active rows (pre-padding)


class _RecordingChallenger(DuplexChallenger):
    """DuplexChallenger that records every raw sample in order."""

    def __init__(self):
        super().__init__()
        self.samples: List[int] = []

    def sample(self) -> int:
        v = super().sample()
        self.samples.append(v)
        return v


class _FakeChallenger:
    """Replays recorded samples; never hashes (attestation checker)."""

    def __init__(self, samples: List[int]):
        self._it = iter(samples)
        self.exhausted_ok = True
        self.consumed = 0

    def observe(self, value):
        pass

    def observe_many(self, values):
        pass

    def sample(self) -> int:
        try:
            v = next(self._it)
            self.consumed += 1
            return v
        except StopIteration:
            self.exhausted_ok = False
            return 0

    def sample_ext(self):
        return (self.sample(), self.sample())

    def sample_bits(self, bits: int) -> int:
        return self.sample() & ((1 << bits) - 1)

    def check_witness(self, bits: int, witness: int) -> bool:
        return self.sample_bits(bits) == 0


# ------------------------------------------------------------ row schedule

@dataclass
class _Row:
    sel: str                      # 't' | 'c' | 'l'
    absorbed: List[Tuple[int, int]]   # (lane, value) fresh input data
    exposed_lanes: List[int]      # output lanes exposed into acco
    exposed_vals: List[int]       # canonical values at those lanes
    b: int = 0


def _obs_values(proof: Proof) -> List[int]:
    """Observation values in transcript order (matches witness.pack_witness
    and the verifier's observe sequence, verifier.rs:135-139, 363-376)."""
    fp = proof.opening_proof.fri_proof
    obs: List[int] = []
    obs += proof.commitments.trace.value
    obs += proof.commitments.quotient_chunks.value
    for c in fp.commit_phase_commits:
        obs += c.value
    obs.append(fp.pow_witness)
    return obs


def _transcript_rows(proof: Proof, config, samples: List[int]) -> List[_Row]:
    """Transcript duplex rows from the symbolic schedule."""
    from .challenger import SymbolicChallenger

    fc = config.fri_config
    sym = SymbolicChallenger()
    sym.observe(4)
    sym.sample_ext()                  # alpha
    sym.observe(4)
    sym.sample_ext()                  # zeta
    sym.sample_ext()                  # alpha_fri
    for _ in range(config.log_trace_height):
        sym.observe(4)
        sym.sample_ext()              # beta
    sym.observe(1)                    # pow witness
    sym.sample()                      # pow check
    for _ in range(fc.num_queries):
        sym.sample()                  # query index sample

    obs = _obs_values(proof)
    rows = [
        _Row(sel="t",
             absorbed=[(lane, obs[oid]) for lane, oid in enumerate(step)],
             exposed_lanes=[], exposed_vals=[])
        for step in sym.steps
    ]
    # The first duplex starts from the ZERO sponge state with only its
    # absorbed lanes set — exactly the leaf-row (chain start) semantics.
    # Typing it 'l' (not 't') makes schedules CONCATENABLE: in a
    # multi-proof trace the next proof's transcript must not chain from
    # the previous proof's last row (attest_many).
    rows[0].sel = "l"
    for i, (step, lane) in enumerate(sym.sample_srcs):
        rows[step].exposed_lanes.append(lane)
        rows[step].exposed_vals.append(samples[i])
    return rows


def _leaf_rows(flat_vals: List[int]) -> List[_Row]:
    """Overwrite-mode sponge rows for one leaf (commit.rs:23-46): RATE-
    sized chunks; first row starts the chain, later rows chain like
    transcript duplexes."""
    rows = []
    for off in range(0, len(flat_vals), RATE):
        chunk = flat_vals[off:off + RATE]
        rows.append(_Row(
            sel="l" if off == 0 else "t",
            absorbed=[(j, v) for j, v in enumerate(chunk)],
            exposed_lanes=[], exposed_vals=[]))
    return rows


def _path_rows(index: int, siblings: List[List[int]],
               root_vals: List[int]) -> List[_Row]:
    """Compress-chain rows for one Merkle path; the last row exposes the
    root (canonically: the commitment)."""
    rows = []
    idx = index
    for d, sib in enumerate(siblings):
        b = idx & 1
        lanes = range(0, 4) if b else range(4, 8)
        rows.append(_Row(sel="c",
                         absorbed=[(j, v) for j, v in zip(lanes, sib)],
                         exposed_lanes=[], exposed_vals=[], b=b))
        idx >>= 1
    rows[-1].exposed_lanes = [0, 1, 2, 3]
    rows[-1].exposed_vals = list(root_vals)
    return rows


def build_row_schedule(proof: Proof, config, samples: List[int],
                       fold_leaves) -> List[_Row]:
    """The canonical row schedule of one verification (see module doc)."""
    fc = config.fri_config
    fp = proof.opening_proof.fri_proof
    log_max = config.log_trace_height + fc.log_blowup
    rows = _transcript_rows(proof, config, samples)

    n_pre = 6 + 2 * config.log_trace_height + 1  # samples before queries
    for q in range(fc.num_queries):
        index = samples[n_pre + q] & ((1 << log_max) - 1)
        batches = proof.opening_proof.query_openings[q]
        commits = [proof.commitments.trace.value,
                   proof.commitments.quotient_chunks.value]
        for b_i, batch in enumerate(batches):
            flat = [v for row in batch.opened_values for v in row]
            rows += _leaf_rows(flat)
            rows += _path_rows(index, batch.opening_proof, commits[b_i])
        # fold levels
        idx = index
        steps = fp.query_proofs[q].commit_phase_openings
        for l, step in enumerate(steps):
            e0, e1 = fold_leaves[q][l]
            rows += _leaf_rows([e0[0], e0[1], e1[0], e1[1]])
            rows += _path_rows(idx >> 1, step.opening_proof,
                               fp.commit_phase_commits[l].value)
            idx >>= 1
    return rows


# ----------------------------------------------------------- accumulators

def derive_gammas(rows: List[_Row]) -> Tuple[int, int]:
    """gammas = Poseidon2 MERKLE-TREE digest of the canonical
    absorbed+exposed sequence (so the binding point depends on the data
    itself).  A tree, not a sponge: the ~50k-value golden sequence hashes
    in one batched device pass instead of a 12.5k-permutation sequential
    chain (~3s of host python)."""
    import numpy as np

    from .fields import gl
    from .fields.goldilocks import to_u64_np
    from .ops.mmcs import _build_tree

    seq: List[int] = [len(rows)]
    for r in rows:
        for lane, v in r.absorbed:
            seq.append(lane)
            seq.append(v % P)
        for lane, v in zip(r.exposed_lanes, r.exposed_vals):
            seq.append(WIDTH + lane)
            seq.append(v % P)
    arr = np.zeros(( -(-len(seq) // 4), 4), np.uint64)
    arr.reshape(-1)[: len(seq)] = seq
    n_leaves = 1 << (max(len(arr), 2) - 1).bit_length()
    if n_leaves != len(arr):
        arr = np.vstack([arr, np.zeros((n_leaves - len(arr), 4), np.uint64)])
    root = to_u64_np(_build_tree(gl.from_u64(arr))[-1][0])
    g1, g2 = int(root[0]), int(root[1])
    # gamma = 0 would erase the binding; astronomically unlikely, but be
    # total about it
    return (g1 or 1, g2 or 1)


def fold_accumulators(rows: List[_Row], gamma: Tuple[int, int]):
    """Canonical (acc, acc_out) over active rows."""
    accs = [0, 0]
    accos = [0, 0]
    for r in rows:
        for k, g in enumerate(gamma):
            gg = pow(g, WIDTH, P)
            c = 0
            for lane, v in r.absorbed:
                c = (c + (v % P) * pow(g, lane, P)) % P
            accs[k] = (accs[k] * gg + c) % P
            co = 0
            for lane, v in zip(r.exposed_lanes, r.exposed_vals):
                co = (co + (v % P) * pow(g, lane, P)) % P
            accos[k] = (accos[k] * gg + co) % P
    return (accs[0], accs[1]), (accos[0], accos[1])


# ----------------------------------------------------------- trace build

def _rows_to_trace_host(rows: List[_Row], log_n: Optional[int] = None):
    """Sequential-host oracle for _rows_to_trace (kept as the executable
    spec the level-synchronous builder is tested against)."""
    import numpy as np

    from .fields import gl
    from .models.poseidon2_air import poseidon2_core_rows

    R = len(rows)
    height = 1 << (max(R, 2) - 1).bit_length()
    if log_n is not None:
        assert height <= (1 << log_n), "schedule exceeds requested height"
        height = 1 << log_n

    states = []
    sel = np.zeros((height, 3), np.uint64)
    bcol = np.zeros((height,), np.uint64)
    m = np.zeros((height, WIDTH), np.uint64)
    mo = np.zeros((height, WIDTH), np.uint64)
    prev_out = [0] * WIDTH
    for i, r in enumerate(rows):
        if r.sel == "t":
            st = list(prev_out)
        elif r.sel == "c":
            dig = prev_out[:4]
            st = [0] * WIDTH
            if r.b:
                st[4:8] = dig
            else:
                st[0:4] = dig
        else:  # leaf chain start
            st = [0] * WIDTH
        for lane, v in r.absorbed:
            st[lane] = v % P
            m[i, lane] = 1
        for lane in r.exposed_lanes:
            mo[i, lane] = 1
        sel[i, {"t": 0, "c": 1, "l": 2}[r.sel]] = 1
        bcol[i] = r.b
        states.append(st)
        prev_out = poseidon2(st)
    for _ in range(height - R):
        states.append([0] * WIDTH)

    from .fields.goldilocks import to_u64_np

    core = to_u64_np(poseidon2_core_rows(gl.from_u64(
        np.asarray(states, object))))          # (height, CORE_WIDTH) uint64

    return core, sel, bcol, m, mo, height


def _rows_to_trace(rows: List[_Row], log_n: Optional[int] = None):
    """Chain columns + core columns from the row schedule.

    Chained input states are resolved LEVEL-SYNCHRONOUSLY: all chains
    advance together, one batched device permutation per chain level
    (padded to the chain count so every level shares one compiled shape).
    The sequential host replay this replaces (_rows_to_trace_host) costs
    ~4-5ms per permutation — ~20s of the golden attestation's warm
    latency."""
    import numpy as np

    from .fields import gl
    from .fields.goldilocks import to_u64_np
    from .models.poseidon2_air import poseidon2_core_rows
    from .ops.poseidon2 import poseidon2_permute

    R = len(rows)
    height = 1 << (max(R, 2) - 1).bit_length()
    if log_n is not None:
        assert height <= (1 << log_n), "schedule exceeds requested height"
        height = 1 << log_n

    sel = np.zeros((height, 3), np.uint64)
    bcol = np.zeros((height,), np.uint64)
    m = np.zeros((height, WIDTH), np.uint64)
    mo = np.zeros((height, WIDTH), np.uint64)
    absorbed = np.zeros((R, WIDTH), np.uint64)
    chains: List[List[int]] = []
    for i, r in enumerate(rows):
        sel[i, {"t": 0, "c": 1, "l": 2}[r.sel]] = 1
        bcol[i] = r.b
        for lane, v in r.absorbed:
            absorbed[i, lane] = v % P
            m[i, lane] = 1
        for lane in r.exposed_lanes:
            mo[i, lane] = 1
        if r.sel == "l":
            chains.append([i])
        else:
            assert chains, "schedule must open with a chain start"
            chains[-1].append(i)

    n_chains = len(chains)
    maxlen = max(len(c) for c in chains) if chains else 0
    states_np = np.zeros((height, WIDTH), np.uint64)
    out_np = np.zeros((R, WIDTH), np.uint64)
    perm = poseidon2_permute          # module-level jit: warm caches stick
    for k in range(maxlen):
        live = [c for c in chains if len(c) > k]
        idxs = np.asarray([c[k] for c in live])
        if k == 0:
            ins = absorbed[idxs].copy()        # chain starts: zeros + data
        else:
            pouts = out_np[np.asarray([c[k - 1] for c in live])]
            is_c = sel[idxs, 1] == 1
            # transcript rows copy the full previous output
            base = np.where((sel[idxs, 0] == 1)[:, None], pouts, 0)
            # compress rows: digest on the non-sibling side per b
            dig = pouts[:, :4]
            b_here = bcol[idxs] == 1
            left = np.where((is_c & ~b_here)[:, None], dig, base[:, 0:4])
            right = np.where((is_c & b_here)[:, None], dig, base[:, 4:8])
            base = np.concatenate([left, right, base[:, 8:]], axis=1)
            ins = np.where(m[idxs] == 1, absorbed[idxs], base)
        states_np[idxs] = ins
        # one padded device dispatch per level (stable compile shape)
        batch = np.zeros((n_chains, WIDTH), np.uint64)
        batch[: len(idxs)] = ins
        outs = to_u64_np(perm(gl.from_u64(batch)))[: len(idxs)]
        out_np[idxs] = outs

    # core columns STAY ON DEVICE: pulling the (height, 490) block costs
    # ~10s over the axon tunnel at golden size; the device prover consumes
    # device columns directly (build_attestation_trace_cols)
    core_dev = poseidon2_core_rows(gl.from_u64(states_np))

    return core_dev, sel, bcol, m, mo, height


def _acc_columns(rows, height, gamma):
    """Running accumulator columns (host ints)."""
    import numpy as np

    acc = np.zeros((height, 2), np.uint64)
    acco = np.zeros((height, 2), np.uint64)
    gpow = [[pow(g, j, P) for j in range(WIDTH + 1)] for g in gamma]
    cur = [0, 0]
    curo = [0, 0]
    for i in range(height):
        if i < len(rows):
            r = rows[i]
            for k in range(2):
                gp = gpow[k]
                c = sum((v % P) * gp[lane] for lane, v in r.absorbed) % P
                cur[k] = (cur[k] * gp[WIDTH] + c) % P
                co = sum((v % P) * gp[lane]
                         for lane, v in zip(r.exposed_lanes,
                                            r.exposed_vals)) % P
                curo[k] = (curo[k] * gp[WIDTH] + co) % P
        acc[i] = cur
        acco[i] = curo
    return acc, acco


def _chain_cols(rows, gamma, sel, bcol, m, mo, height):
    """The non-core columns as one (height, NUM_HASH_COLS-CORE_WIDTH)
    uint64 block."""
    import numpy as np

    acc, acco = _acc_columns(rows, height, gamma)
    k = NUM_HASH_COLS - CORE_WIDTH
    blk = np.zeros((height, k), np.uint64)
    blk[:, SEL_T - CORE_WIDTH] = sel[:, 0]
    blk[:, SEL_C - CORE_WIDTH] = sel[:, 1]
    blk[:, SEL_L - CORE_WIDTH] = sel[:, 2]
    blk[:, B_COL - CORE_WIDTH] = bcol
    blk[:, M_OFF - CORE_WIDTH:M_OFF - CORE_WIDTH + WIDTH] = m
    blk[:, MO_OFF - CORE_WIDTH:MO_OFF - CORE_WIDTH + WIDTH] = mo
    blk[:, ACC_OFF - CORE_WIDTH:ACC_OFF - CORE_WIDTH + 2] = acc
    blk[:, ACCO_OFF - CORE_WIDTH:ACCO_OFF - CORE_WIDTH + 2] = acco
    return blk


def build_attestation_trace(rows: List[_Row], gamma,
                            log_n: Optional[int] = None):
    """Row-major host uint64 trace (the int-oracle prover's ingest)."""
    import numpy as np

    from .fields.goldilocks import to_u64_np

    core_dev, sel, bcol, m, mo, height = _rows_to_trace(rows, log_n)
    trace = np.zeros((height, NUM_HASH_COLS), np.uint64)
    trace[:, :CORE_WIDTH] = to_u64_np(core_dev)
    trace[:, CORE_WIDTH:] = _chain_cols(rows, gamma, sel, bcol, m, mo,
                                        height)
    return trace


def build_attestation_trace_cols(rows: List[_Row], gamma,
                                 log_n: Optional[int] = None):
    """Device column-major GL (NUM_HASH_COLS, height) trace — the device
    prover's ingest, with the core columns never leaving the device."""
    from .fields import gl

    core_dev, sel, bcol, m, mo, height = _rows_to_trace(rows, log_n)
    chain_dev = gl.from_u64(_chain_cols(rows, gamma, sel, bcol, m, mo,
                                        height))
    full = gl.concatenate([core_dev, chain_dev], axis=-1)  # (H, W)
    from .fields.goldilocks import GL as _GL

    return _GL(full.lo.T, full.hi.T)


# ------------------------------------------------------------- public API

def _device_instrumented_verify(proof: Proof, air, fri_config: FriConfig):
    """Device verification that also yields the raw Fiat-Shamir samples
    and the per-(query, level) fold leaf pairs the row schedule needs —
    replaces the ~1.5s/proof python oracle on the attest path.  Returns
    (ok, samples, fold_leaves)."""
    import jax
    import numpy as np

    from .fields.goldilocks import to_u64_np
    from .verifier import _publics_device, get_verifier
    from .witness import pack_witness

    config = derive_config(proof, fri_config)
    v = get_verifier(air, config)
    if not v.check_shape(proof):
        return False, [], []
    w = pack_witness(proof, config)
    t = v._s_transcript(w["obs"])
    index = t["index"]
    merkle_ok = None
    for b, commit in enumerate([t["trace_commit"], t["quotient_commit"]]):
        okb = v._s_batch(index, w["batch_values"][b], w["batch_sibs"][b],
                         commit)
        merkle_ok = okb if merkle_ok is None else (merkle_ok & okb)
    ro_stack = v._s_ro(
        index, t["zeta"], t["zeta_next"], t["alpha_fri"],
        tuple(w["batch_values"]),
        w["trace_local"], w["trace_next"], w["quotient_chunks"],
    )
    fold_ok, e0s, e1s = v._s_fold(
        index, t["phase_commits"], t["betas_stack"],
        w["fold_sibling_values"], ro_stack, w["fold_sibs"],
        w["final_poly"], record=True,
    )
    quotient_ok = v._s_final(
        t["alpha"], t["zeta"], w["trace_local"], w["trace_next"],
        w["quotient_chunks"], _publics_device(air),
    )
    host = jax.device_get({
        "ok": t["pow_ok"] & jax.numpy.all(merkle_ok) & fold_ok & quotient_ok,
        "samples": t["samples"], "e0": e0s, "e1": e1s,
    })
    samples = [int(x) for x in to_u64_np(host["samples"])]
    e0 = to_u64_np(host["e0"].c0), to_u64_np(host["e0"].c1)   # (L, Q)
    e1 = to_u64_np(host["e1"].c0), to_u64_np(host["e1"].c1)
    L, Q = e0[0].shape
    fold_leaves = [
        [((int(e0[0][l, q]), int(e0[1][l, q])),
          (int(e1[0][l, q]), int(e1[1][l, q]))) for l in range(L)]
        for q in range(Q)
    ]
    return bool(host["ok"]), samples, fold_leaves


def attest(proof: Proof, air, fri_config: FriConfig,
           att_fri_config: Optional[FriConfig] = None,
           use_device_prover: bool = True) -> AttestationBundle:
    """Verify `proof` and emit a STARK attesting the verification.

    Raises CannotAttest if the proof does not verify — a failed
    verification cannot be attested."""
    config = derive_config(proof, fri_config)
    if use_device_prover:
        ok, samples, fold_leaves = _device_instrumented_verify(
            proof, air, fri_config)
        if not ok:
            raise CannotAttest("verification failed (device verifier)")
    else:
        ch = _RecordingChallenger()
        tr = refimpl_verify(proof, air, fri_config, challenger=ch)
        if not tr.ok:
            raise CannotAttest(
                f"verification failed (pow={tr.pow_ok} "
                f"merkle={tr.merkle_ok} fold={tr.fold_ok} "
                f"quotient={tr.quotient_ok})")
        samples, fold_leaves = ch.samples, tr.fold_leaves

    rows = build_row_schedule(proof, config, samples, fold_leaves)
    gamma = derive_gammas(rows)
    acc, acc_out = fold_accumulators(rows, gamma)

    att_fc = att_fri_config or FriConfig(
        log_blowup=1, num_queries=100, proof_of_work_bits=16)
    hc_air = HashChainAir(
        {"gamma": gamma, "acc": acc, "acc_out": acc_out})
    if use_device_prover:
        from .prover import prove_on_device

        cols = build_attestation_trace_cols(rows, gamma)
        stark = prove_on_device(hc_air, cols, att_fc)
    else:
        from .refimpl.prover import prove

        stark = prove(hc_air, build_attestation_trace(rows, gamma), att_fc)
    return AttestationBundle(
        stark=stark, samples=list(samples), gamma=gamma, acc=acc,
        acc_out=acc_out, att_fri_config=att_fc, n_rows=len(rows))


DEFAULT_ATT_FRI_CONFIG = FriConfig(
    log_blowup=1, num_queries=100, proof_of_work_bits=16)


def _att_config_acceptable(bundle_fc: FriConfig,
                           pinned: Optional[FriConfig]) -> bool:
    """The attestation STARK's own FRI config travels in the (untrusted)
    bundle; verifying under it verbatim would let a forged bundle carry
    FriConfig(num_queries=0, ...) and make the STARK check vacuous
    (advisor finding, round 2).  The checker pins the config: either the
    caller's `att_fri_config` or the library default."""
    want = pinned or DEFAULT_ATT_FRI_CONFIG
    return (bundle_fc.log_blowup == want.log_blowup
            and bundle_fc.num_queries == want.num_queries
            and bundle_fc.proof_of_work_bits == want.proof_of_work_bits)


def check_attestation(bundle: AttestationBundle, proof: Proof, air,
                      fri_config: FriConfig,
                      use_device_verifier: bool = True,
                      att_fri_config: Optional[FriConfig] = None) -> bool:
    """Accept iff `bundle` attests a valid verification of `proof`.

    Hash-free except the gamma digest and the attestation STARK's own
    (much smaller) verification.  use_device_verifier=False checks the
    STARK with the int oracle instead (CPU test environments where the
    XLA:CPU backend compiles the 522-wide constraint module pathologically
    slowly; the TPU toolchain does not exhibit this)."""
    import numpy as np

    # 0. checker-pinned attestation security level + fail-closed shape
    # check (a structurally malformed proof must yield False, never an
    # exception — the verify_proof contract, verifier.py)
    if not _att_config_acceptable(bundle.att_fri_config, att_fri_config):
        return False
    from .errors import InvalidProofShape, check_proof_shape

    try:
        check_proof_shape(proof, derive_config(proof, fri_config))
    except InvalidProofShape:
        return False
    if len(proof.opened_values.trace_local) != air.width():
        return False

    # 1. algebra re-execution with the attested challenges
    fake = _FakeChallenger(bundle.samples)
    tr = refimpl_verify(proof, air, fri_config, challenger=fake,
                        check_merkle=False)
    if not (tr.shape_ok and tr.pow_ok and tr.fold_ok and tr.quotient_ok
            and fake.exhausted_ok
            and fake.consumed == len(bundle.samples)):
        return False

    # 2. canonical sequences from proof bytes + samples only
    config = derive_config(proof, fri_config)
    rows = build_row_schedule(proof, config, bundle.samples, tr.fold_leaves)
    gamma = derive_gammas(rows)
    acc, acc_out = fold_accumulators(rows, gamma)
    if (gamma != tuple(bundle.gamma) or acc != tuple(bundle.acc)
            or acc_out != tuple(bundle.acc_out)
            or len(rows) != bundle.n_rows):
        return False
    height = 1 << (max(len(rows), 2) - 1).bit_length()
    if bundle.stark.degree_bits != height.bit_length() - 1:
        return False

    # 3. the attestation STARK itself
    hc_air = HashChainAir(
        {"gamma": gamma, "acc": acc, "acc_out": acc_out})
    if use_device_verifier:
        from .verifier import verify_proof

        r = verify_proof(bundle.stark, hc_air, bundle.att_fri_config)
        return bool(np.asarray(r.ok))
    return bool(refimpl_verify(bundle.stark, hc_air,
                               bundle.att_fri_config).ok)


# ----------------------------------------------------------- serialization

def bundle_to_json(bundle) -> Dict:
    """JSON form of an Attestation/MultiAttestationBundle — the analogue of
    the reference persisting its output proof (src/p3/mod.rs:261).  The
    inner STARK reuses the byte-exact proof schema (proof.py)."""
    from .proof import proof_to_json

    fc = bundle.att_fri_config
    out = {
        "stark": proof_to_json(bundle.stark),
        "gamma": list(bundle.gamma),
        "acc": list(bundle.acc),
        "acc_out": list(bundle.acc_out),
        "att_fri_config": {
            "log_blowup": fc.log_blowup,
            "num_queries": fc.num_queries,
            "proof_of_work_bits": fc.proof_of_work_bits,
        },
        "n_rows": bundle.n_rows,
    }
    if isinstance(bundle, MultiAttestationBundle):
        out["samples"] = [list(s) for s in bundle.samples]
    else:
        out["samples"] = list(bundle.samples)
    return out


def bundle_from_json(obj: Dict):
    """Inverse of bundle_to_json; nested samples select the multi form."""
    from .proof import proof_from_json

    fc = FriConfig(**obj["att_fri_config"])
    multi = bool(obj["samples"]) and isinstance(obj["samples"][0], list)
    cls = MultiAttestationBundle if multi else AttestationBundle
    return cls(
        stark=proof_from_json(obj["stark"]),
        samples=obj["samples"],
        gamma=tuple(obj["gamma"]),
        acc=tuple(obj["acc"]),
        acc_out=tuple(obj["acc_out"]),
        att_fri_config=fc,
        n_rows=obj["n_rows"],
    )


def save_bundle(bundle, path: str) -> None:
    import json

    with open(path, "w") as f:
        json.dump(bundle_to_json(bundle), f)


def load_bundle(path: str):
    import json

    with open(path) as f:
        return bundle_from_json(json.load(f))


# ------------------------------------------------------- batch aggregation

@dataclass
class MultiAttestationBundle:
    stark: Proof
    samples: List[List[int]]      # per proof, in verification order
    gamma: Tuple[int, int]
    acc: Tuple[int, int]
    acc_out: Tuple[int, int]
    att_fri_config: FriConfig
    n_rows: int


def _multi_rows(proofs: List[Proof], air, fri_config: FriConfig,
                samples_list, fold_leaves_list) -> List[_Row]:
    rows: List[_Row] = []
    for proof, samples, leaves in zip(proofs, samples_list,
                                      fold_leaves_list):
        config = derive_config(proof, fri_config)
        rows += build_row_schedule(proof, config, samples, leaves)
    return rows


def attest_many(proofs: List[Proof], air, fri_config: FriConfig,
                att_fri_config: Optional[FriConfig] = None,
                use_device_prover: bool = True) -> MultiAttestationBundle:
    """One STARK attesting the verification of a whole batch of proofs.

    The per-proof row schedules concatenate into one HashChainAir trace
    (each proof's transcript opens a fresh chain, so no constraints cross
    proof boundaries); the accumulators run across the entire batch.
    Amortized, this is where attestation pays: B verifications collapse
    into one proof whose own verification cost does not grow with B's
    hashing work."""
    samples_list, leaves_list = [], []
    for i, proof in enumerate(proofs):
        if use_device_prover:
            ok, samples, leaves = _device_instrumented_verify(
                proof, air, fri_config)
            if not ok:
                raise CannotAttest(f"proof {i} failed verification")
        else:
            ch = _RecordingChallenger()
            tr = refimpl_verify(proof, air, fri_config, challenger=ch)
            if not tr.ok:
                raise CannotAttest(f"proof {i} failed verification")
            samples, leaves = ch.samples, tr.fold_leaves
        samples_list.append(samples)
        leaves_list.append(leaves)

    rows = _multi_rows(proofs, air, fri_config, samples_list, leaves_list)
    gamma = derive_gammas(rows)
    acc, acc_out = fold_accumulators(rows, gamma)

    att_fc = att_fri_config or FriConfig(
        log_blowup=1, num_queries=100, proof_of_work_bits=16)
    hc_air = HashChainAir({"gamma": gamma, "acc": acc, "acc_out": acc_out})
    if use_device_prover:
        from .prover import prove_on_device

        stark = prove_on_device(
            hc_air, build_attestation_trace_cols(rows, gamma), att_fc)
    else:
        from .refimpl.prover import prove

        stark = prove(hc_air, build_attestation_trace(rows, gamma), att_fc)
    return MultiAttestationBundle(
        stark=stark, samples=[list(s) for s in samples_list], gamma=gamma,
        acc=acc, acc_out=acc_out, att_fri_config=att_fc, n_rows=len(rows))


def check_attestations(bundle: MultiAttestationBundle, proofs: List[Proof],
                       air, fri_config: FriConfig,
                       use_device_verifier: bool = True,
                       att_fri_config: Optional[FriConfig] = None) -> bool:
    """Accept iff `bundle` attests valid verifications of ALL `proofs`."""
    import numpy as np

    from .errors import InvalidProofShape, check_proof_shape

    if not _att_config_acceptable(bundle.att_fri_config, att_fri_config):
        return False
    if len(bundle.samples) != len(proofs):
        return False
    leaves_list = []
    for proof, samples in zip(proofs, bundle.samples):
        try:
            check_proof_shape(proof, derive_config(proof, fri_config))
        except InvalidProofShape:
            return False
        if len(proof.opened_values.trace_local) != air.width():
            return False
        fake = _FakeChallenger(samples)
        tr = refimpl_verify(proof, air, fri_config, challenger=fake,
                            check_merkle=False)
        if not (tr.shape_ok and tr.pow_ok and tr.fold_ok and tr.quotient_ok
                and fake.exhausted_ok
                and fake.consumed == len(samples)):
            return False
        leaves_list.append(tr.fold_leaves)

    rows = _multi_rows(proofs, air, fri_config, bundle.samples, leaves_list)
    gamma = derive_gammas(rows)
    acc, acc_out = fold_accumulators(rows, gamma)
    if (gamma != tuple(bundle.gamma) or acc != tuple(bundle.acc)
            or acc_out != tuple(bundle.acc_out)
            or len(rows) != bundle.n_rows):
        return False
    height = 1 << (max(len(rows), 2) - 1).bit_length()
    if bundle.stark.degree_bits != height.bit_length() - 1:
        return False

    hc_air = HashChainAir({"gamma": gamma, "acc": acc, "acc_out": acc_out})
    if use_device_verifier:
        from .verifier import verify_proof

        r = verify_proof(bundle.stark, hc_air, bundle.att_fri_config)
        return bool(np.asarray(r.ok))
    return bool(refimpl_verify(bundle.stark, hc_air,
                               bundle.att_fri_config).ok)
