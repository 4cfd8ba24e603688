"""Batch prover: B same-shape proofs through one vmapped pipeline.

Single-proof proving latency is dominated by per-phase FIXED costs
(dispatch chains over the TPU tunnel, ~0.3s/phase), not compute; proving B
traces of one shape in lockstep amortizes all of it.  Every stage of
TpuProver is vmapped over a leading proof axis, the Fiat-Shamir transcripts
advance together in one batched DeviceChallenger (B independent duplex
sponges — values never cross proofs), and the PoW grind searches all B
witnesses in shared device-batched windows with per-proof first-hit
selection (identical witness order to the sequential grind).

Trees are BATCHED rather than vmapped (ops/mmcs._build_tree_batched): the
proof axis flattens into the permute batch, so the fused Pallas kernel
applies on TPU (a pallas_call under vmap would lower to a serial per-proof
grid loop).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..air import Air
from ..constants import EXT_DEGREE
from ..fields import gl, gl2
from ..fields.extension import GL2
from ..fields.goldilocks import GL
from ..ops.mmcs import _build_tree_batched, _open_paths
from ..proof import (
    BatchOpening,
    Commitment,
    Commitments,
    CommitPhaseProofStep,
    FriConfig,
    FriProof,
    OpenedValues,
    Proof,
    QueryProof,
    TwoAdicFriPcsProof,
)
from ..utils.bits import log2_strict
from .device_challenger import DeviceChallenger
from .prove import TpuProver


@jax.jit
def _gather_rows(rows: GL, idx):
    """rows (B, N, k), idx (B, Q) -> (B, Q, k)."""
    return jax.vmap(lambda r, i: r[i])(rows, idx)


@jax.jit
def _gather_vec(vec: GL2, idx):
    """vec (B, m) ext, idx (B, Q) -> (B, Q) ext."""
    return jax.vmap(lambda v, i: v[i])(vec, idx)


_open_paths_v = jax.jit(jax.vmap(_open_paths))


class BatchProver:
    """Prove a batch of same-shape traces in one vmapped pipeline."""

    def __init__(self, air: Air, log_n: int, fri_config: FriConfig,
                 quotient_eval_chunks: int = 1):
        self.base = TpuProver(air, log_n, fri_config,
                              quotient_eval_chunks=quotient_eval_chunks)
        b = self.base
        self._c_trace = jax.jit(jax.vmap(b._commit_trace_fn))
        # publics broadcast across the batch (same-bundle batches);
        # stage-2 columns/challenges ride the proof axis (None-valued for
        # single-stage airs: empty pytrees, any in_axes spec applies)
        self._quot = jax.jit(jax.vmap(b._quotient_fn,
                                      in_axes=(0, 0, None, 0, 0)))
        self._chunks = jax.jit(jax.vmap(b._commit_chunks_fn))
        self._opened = jax.jit(jax.vmap(b._opened_fn))
        self._ro = jax.jit(jax.vmap(b._ro_fn))
        build_dev = getattr(b.air, "build_stage2_device", None)
        self._stage2_v = (jax.jit(jax.vmap(build_dev, in_axes=(0, 0)))
                          if b.s2w and build_dev is not None else None)
        # batched (not vmapped) trees: the proof axis flattens into the
        # permute batch so the fused Pallas kernel applies on TPU
        self._tree = _build_tree_batched
        self._grind_v = jax.jit(jax.vmap(b._grind_fn, in_axes=(0, None)))
        self._folds = {}
        for log_folded in range(b.log_max - 1, fri_config.log_blowup - 1, -1):
            rows_fn, step_fn = b._fold_phase_raw(log_folded)
            self._folds[log_folded] = (jax.jit(jax.vmap(rows_fn)),
                                       jax.jit(jax.vmap(step_fn)))
        self._warmed_batch_sizes = set()

    def warmup(self, n_proofs: int, max_workers: int = 8) -> None:
        """Compile all vmapped modules for a batch of n_proofs concurrently
        (same rationale as TpuProver.warmup: first-proof latency is module
        count x fixed remote-compile latency, ~3x faster in parallel)."""
        from concurrent.futures import ThreadPoolExecutor

        b = self.base
        fc = b.fc
        B = n_proofs
        W, H = b.width, 1 << b.log_n
        N = 1 << b.log_max
        qsize = 1 << b.q_log_n
        l = b.q_log_n - b.lqd + fc.log_blowup
        Q = fc.num_queries

        def z(shape):
            zz = jnp.zeros(shape, jnp.uint32)
            return GL(zz, zz)

        def ze(shape):
            return GL2(z(shape), z(shape))

        def levels_for(n0):
            levels = []
            k = n0
            while True:
                levels.append(z((B, k, 4)))
                if k == 1:
                    break
                k //= 2
            return tuple(levels)

        s2w = b.s2w
        chs = [ze((B,)) for _ in range(b.n_challenges)]
        s2c = z((B, s2w, H)) if s2w else None
        calls = [
            lambda: self._c_trace(z((B, W, H))),
            lambda: self._quot(z((B, W, H)), ze((B,)),
                               {k: ze(()) for k in b.air.public_values()},
                               s2c, chs),
            lambda: self._chunks(ze((B, qsize))),
            lambda: self._opened(z((B, W, H)), ze((B, qsize)), ze((B,)), s2c),
            lambda: self._ro(z((B, N, W)), z((B, 1 << l, b.n_chunks * EXT_DEGREE)),
                             ze((B, W)), ze((B, W)),
                             ze((B, b.n_chunks, EXT_DEGREE)), ze((B,)), ze((B,)),
                             z((B, N, s2w)) if s2w else None,
                             ze((B, s2w)) if s2w else None,
                             ze((B, s2w)) if s2w else None),
            lambda: self._grind_v(z((B, 11)), jnp.uint32(0)),
            lambda: self._tree(z((B, N, W))),
            lambda: self._tree(z((B, 1 << l, b.n_chunks * EXT_DEGREE))),
            lambda: _open_paths_v(levels_for(N), jnp.zeros((B, Q), jnp.uint32)),
            lambda: _open_paths_v(levels_for(1 << l),
                                  jnp.zeros((B, Q), jnp.uint32)),
        ]
        if s2w:
            calls.append(lambda: self._c_trace(z((B, s2w, H))))
            calls.append(lambda: self._tree(z((B, N, s2w))))
        for log_folded, (rows_v, step_v) in self._folds.items():
            m = 1 << log_folded
            calls.append(lambda f=rows_v, mm=m: f(ze((B, 2 * mm))))
            calls.append(lambda f=step_v, mm=m: f(ze((B, mm)), ze((B, mm)),
                                                  ze((B,))))
            calls.append(lambda mm=m: self._tree(z((B, mm, 4))))
            calls.append(lambda mm=m: _open_paths_v(
                levels_for(mm), jnp.zeros((B, Q), jnp.uint32)))

        # Concurrent warmup EXECUTES each module on zero inputs; at large
        # B x W x N the working sets of 8 simultaneous calls exceed HBM
        # (keccak B=16: the quotient module alone holds ~3GB live —
        # RESOURCE_EXHAUSTED under full concurrency).  Scale workers by
        # the quotient module's live set: its trace input plus the
        # per-segment ext locals/nexts (r4 advisor finding: the
        # trace-LDE-only formula (B*N*W*8) put the measured keccak-B=16
        # blowup in the 2-worker band; this sizes the module that
        # actually exhausted memory, and the threshold covers that case
        # by construction).
        S = getattr(b, "quotient_eval_chunks", 1) or 1
        big = B * W * H * 8 + 2 * B * W * (qsize // S) * 8 * EXT_DEGREE
        if big > 2 << 30:
            max_workers = 1
        elif big > 1 << 30:
            max_workers = min(max_workers, 2)
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            list(ex.map(lambda c: jax.block_until_ready(c()), calls))
        self._warmed_batch_sizes.add(B)

    def prove(self, traces: List[List[List[int]]], mesh=None) -> List[Proof]:
        """traces: B row-major traces of identical shape -> B proofs,
        each identical to what TpuProver.prove would produce.

        With `mesh` (a 1-D jax.sharding.Mesh), the proof axis is sharded
        over its devices — data-parallel proving: proofs are mutually
        independent, so placing the input columns sharded makes the XLA
        partitioner run every stage (LDE commits, trees, transcript
        duplexes, grind, fold) without any cross-device communication;
        only the grind's found-all check and final assembly reduce/pull."""
        b = self.base
        fc = b.fc
        B = len(traces)
        H = 1 << b.log_n
        assert all(len(t) == H and len(t[0]) == b.width for t in traces)
        ch = DeviceChallenger(batch=(B,))

        if all(isinstance(t, np.ndarray) and t.dtype != object
               for t in traces):
            stacked = np.stack(traces)                   # numeric fast path
        else:
            # exact uint64 coercion first (see TpuProver.prove: the
            # object path loops per element); falls back for values
            # outside [0, 2^64)
            try:
                stacked = np.asarray(traces, dtype=np.uint64)
            except (OverflowError, TypeError, ValueError):
                stacked = np.asarray(traces, dtype=object)
        cols = gl.from_u64(np.transpose(stacked, (0, 2, 1)))  # (B,W,H)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            axis = mesh.axis_names[0]
            assert B % int(np.prod(mesh.devices.shape)) == 0, (
                "batch must be a multiple of the mesh size")
            sh = NamedSharding(mesh, Pspec(axis, None, None))
            cols = GL(jax.device_put(cols.lo, sh), jax.device_put(cols.hi, sh))
            ch.state = GL(*(jax.device_put(a, NamedSharding(mesh, Pspec(axis, None)))
                            for a in ch.state))

        trace_rows = self._c_trace(cols)                       # (B, N, W)
        trace_levels = self._tree(trace_rows)
        ch.observe_many(trace_levels[-1][:, 0])                # roots (B, 4)

        # stage 2: per-proof challenges (B,) ext, stage-2 columns on the
        # proof axis, committed before alpha (prove.py stage-2 leg)
        challenges_d = [ch.sample_ext() for _ in range(b.n_challenges)]
        s2_cols = s2_rows = s2_levels = None
        if b.s2w:
            if self._stage2_v is not None:
                s2_cols = self._stage2_v(cols, challenges_d)   # (B, s2w, H)
            else:
                chs_h = [list(zip(np.asarray(gl.to_u64_np(c.c0)),
                                  np.asarray(gl.to_u64_np(c.c1))))
                         for c in challenges_d]
                rows_h = np.asarray(
                    gl.to_u64_np(GL(cols.lo.transpose(0, 2, 1),
                                    cols.hi.transpose(0, 2, 1))))
                s2_h = [b.air.build_stage2(
                            rows_h[bi].tolist(),
                            [(int(c[bi][0]), int(c[bi][1])) for c in chs_h])
                        for bi in range(B)]
                s2_cols = gl.from_u64(np.asarray(s2_h, dtype=object))
            s2_rows = self._c_trace(s2_cols)                   # (B, N, s2w)
            s2_levels = self._tree(s2_rows)
            ch.observe_many(s2_levels[-1][:, 0])

        alpha_d = ch.sample_ext()                              # (B,) ext

        from ..verifier import _publics_device

        q_evals = self._quot(cols, alpha_d, _publics_device(b.air),
                             s2_cols, challenges_d)
        q_rows = self._chunks(q_evals)
        q_levels = self._tree(q_rows)
        ch.observe_many(q_levels[-1][:, 0])
        zeta_d = ch.sample_ext()

        if b.s2w:
            tl, tn, qc, s2l, s2n = self._opened(cols, q_evals, zeta_d,
                                                s2_cols)
        else:
            tl, tn, qc = self._opened(cols, q_evals, zeta_d)
            s2l = s2n = None

        alpha_fri_d = ch.sample_ext()
        u = self._ro(trace_rows, q_rows, tl, tn, qc, zeta_d, alpha_fri_d,
                     s2_rows, s2l, s2n)

        phase_levels = []
        phase_vectors = []
        for log_folded in range(b.log_max - 1, fc.log_blowup - 1, -1):
            rows_v, step_v = self._folds[log_folded]
            rows, e0, e1 = rows_v(u)
            levels = self._tree(rows)
            phase_levels.append(levels)
            phase_vectors.append(u)
            ch.observe_many(levels[-1][:, 0])
            beta_d = ch.sample_ext()
            u = step_v(e0, e1, beta_d)

        low_degree_ok = jnp.all(gl2.eq(
            u, gl2.broadcast_to(GL2(u.c0[:, :1], u.c1[:, :1]), u.c0.shape)))

        # PoW grind: shared ascending windows, per-proof first hit
        assert not ch.input_buffer
        state_rest = ch.state[..., 1:12]                        # (B, 11)
        found = jnp.zeros((B,), bool)
        wit = jnp.zeros((B,), jnp.uint32)
        base = 0
        while not bool(np.asarray(found.all())):
            f, off = self._grind_v(state_rest, jnp.uint32(base))
            hit = f & ~found
            wit = jnp.where(hit, jnp.uint32(base) + off.astype(jnp.uint32), wit)
            found = found | f
            base += 1 << 16
            assert base < (1 << 32), "PoW grind runaway"
        ch.observe(GL(wit, jnp.zeros((B,), jnp.uint32)))
        pow_ok = jnp.all(ch.sample_bits(fc.proof_of_work_bits) == 0)

        qidx = ch.sample_many_bits(fc.num_queries, b.log_max)   # (B, Q)

        # ---- assembly (single pull region)
        assert bool(np.asarray(pow_ok)), "PoW self-check failed"
        assert bool(np.asarray(low_degree_ok)), "FRI input not low-degree"

        trace_open = np.asarray(gl.to_u64_np(_gather_rows(trace_rows, qidx)))
        q_open = np.asarray(gl.to_u64_np(_gather_rows(q_rows, qidx)))
        trace_paths = np.asarray(gl.to_u64_np(_open_paths_v(trace_levels, qidx)))
        q_paths = np.asarray(gl.to_u64_np(_open_paths_v(q_levels, qidx)))
        if b.s2w:
            s2_open = np.asarray(gl.to_u64_np(_gather_rows(s2_rows, qidx)))
            s2_paths = np.asarray(gl.to_u64_np(_open_paths_v(s2_levels, qidx)))
            s2_roots = np.asarray(gl.to_u64_np(s2_levels[-1][:, 0]))
            s2l_h = (np.asarray(gl.to_u64_np(s2l.c0)),
                     np.asarray(gl.to_u64_np(s2l.c1)))
            s2n_h = (np.asarray(gl.to_u64_np(s2n.c0)),
                     np.asarray(gl.to_u64_np(s2n.c1)))

        fold_sibs, fold_paths = [], []
        idx_l = qidx
        for l, levels in enumerate(phase_levels):
            sib = _gather_vec(phase_vectors[l], idx_l ^ 1)
            fold_sibs.append((np.asarray(gl.to_u64_np(sib.c0)),
                              np.asarray(gl.to_u64_np(sib.c1))))
            fold_paths.append(np.asarray(gl.to_u64_np(
                _open_paths_v(levels, idx_l >> 1))))
            idx_l = idx_l >> 1

        trace_roots = np.asarray(gl.to_u64_np(trace_levels[-1][:, 0]))
        q_roots = np.asarray(gl.to_u64_np(q_levels[-1][:, 0]))
        phase_roots = [np.asarray(gl.to_u64_np(lv[-1][:, 0]))
                       for lv in phase_levels]
        tl_h = (np.asarray(gl.to_u64_np(tl.c0)), np.asarray(gl.to_u64_np(tl.c1)))
        tn_h = (np.asarray(gl.to_u64_np(tn.c0)), np.asarray(gl.to_u64_np(tn.c1)))
        qc_h = (np.asarray(gl.to_u64_np(qc.c0)), np.asarray(gl.to_u64_np(qc.c1)))
        fp_h = (np.asarray(gl.to_u64_np(u.c0[:, 0])), np.asarray(gl.to_u64_np(u.c1[:, 0])))
        wit_h = np.asarray(wit)

        D = EXT_DEGREE
        proofs = []
        for bi in range(B):
            query_openings = []
            query_proofs = []
            for qi in range(fc.num_queries):
                batches = [
                    BatchOpening(
                        opened_values=[[int(v) for v in trace_open[bi, qi]]],
                        opening_proof=[[int(v) for v in sib]
                                       for sib in trace_paths[bi, qi]],
                    ),
                ]
                if b.s2w:
                    batches.append(BatchOpening(
                        opened_values=[[int(v) for v in s2_open[bi, qi]]],
                        opening_proof=[[int(v) for v in sib]
                                       for sib in s2_paths[bi, qi]],
                    ))
                batches.append(
                    BatchOpening(
                        opened_values=[
                            [int(q_open[bi, qi][ci * D + e]) for e in range(D)]
                            for ci in range(b.n_chunks)
                        ],
                        opening_proof=[[int(v) for v in sib]
                                       for sib in q_paths[bi, qi]],
                    ),
                )
                query_openings.append(batches)
                steps = []
                for l in range(len(phase_levels)):
                    steps.append(CommitPhaseProofStep(
                        sibling_value=(int(fold_sibs[l][0][bi, qi]),
                                       int(fold_sibs[l][1][bi, qi])),
                        opening_proof=[[int(v) for v in sib]
                                       for sib in fold_paths[l][bi, qi]],
                    ))
                query_proofs.append(QueryProof(commit_phase_openings=steps))

            proofs.append(Proof(
                commitments=Commitments(
                    trace=Commitment(value=[int(v) for v in trace_roots[bi]]),
                    quotient_chunks=Commitment(
                        value=[int(v) for v in q_roots[bi]]),
                    stage2=(Commitment(
                        value=[int(v) for v in s2_roots[bi]])
                        if b.s2w else None),
                ),
                opened_values=OpenedValues(
                    trace_local=[(int(tl_h[0][bi, i]), int(tl_h[1][bi, i]))
                                 for i in range(b.width)],
                    trace_next=[(int(tn_h[0][bi, i]), int(tn_h[1][bi, i]))
                                for i in range(b.width)],
                    quotient_chunks=[
                        [(int(qc_h[0][bi, ci, e]), int(qc_h[1][bi, ci, e]))
                         for e in range(D)]
                        for ci in range(b.n_chunks)
                    ],
                    stage2_local=([(int(s2l_h[0][bi, i]), int(s2l_h[1][bi, i]))
                                   for i in range(b.s2w)] if b.s2w else None),
                    stage2_next=([(int(s2n_h[0][bi, i]), int(s2n_h[1][bi, i]))
                                  for i in range(b.s2w)] if b.s2w else None),
                ),
                opening_proof=TwoAdicFriPcsProof(
                    fri_proof=FriProof(
                        commit_phase_commits=[
                            Commitment(value=[int(v) for v in pr[bi]])
                            for pr in phase_roots
                        ],
                        query_proofs=query_proofs,
                        final_poly=(int(fp_h[0][bi]), int(fp_h[1][bi])),
                        pow_witness=int(wit_h[bi]),
                    ),
                    query_openings=query_openings,
                ),
                degree_bits=b.log_n,
            ))
        return proofs


_batch_prover_cache: Dict = {}


def prove_batch_on_device(air: Air, traces: List[List[List[int]]],
                          fri_config: FriConfig, warmup: bool = True,
                          quotient_eval_chunks: int = 1) -> List[Proof]:
    log_n = log2_strict(len(traces[0]))
    key = (air.name(), air.width(), log_n, fri_config.log_blowup,
           fri_config.num_queries, fri_config.proof_of_work_bits,
           quotient_eval_chunks, air.stage2_width(), air.num_challenges())
    p = _batch_prover_cache.get(key)
    if p is None:
        p = BatchProver(air, log_n, fri_config,
                        quotient_eval_chunks=quotient_eval_chunks)
        _batch_prover_cache[key] = p
    # concurrent warmup only pays where compiles go to the remote TPU
    # service; on CPU the thread pool just serializes on one core.  Keyed
    # on the batch size: vmapped modules recompile per B.
    if (warmup and jax.default_backend() == "tpu"
            and len(traces) not in p._warmed_batch_sizes):
        p.warmup(len(traces))
    return p.prove(traces)
