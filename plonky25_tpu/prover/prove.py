"""TPU-native Plonky3-compatible STARK prover.

Device-side counterpart of refimpl/prover.py (the executable spec that
reproduces the golden artifact byte-for-byte): LDE commits, quotient
evaluation, FRI folding, PoW grinding and query opening all run as batched
JAX kernels; only the Fiat-Shamir transcript is orchestrated on host (it
consumes a handful of 4-element digests per phase).

Produced proofs are BIT-IDENTICAL to the reference prover's (deterministic
pipeline, same conventions), which is asserted in tests.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..air import Air, VerifierConstraintFolder
from ..constants import GOLDILOCKS_P as P, EXT_DEGREE
from ..fields import gl, gl2
from ..fields.extension import GL2
from ..fields.goldilocks import GL
from ..ops.mmcs import DeviceMerkleTree
from ..ops.ntt import (_ntt_flat, barycentric_eval_ext, coset_intt,
                       coset_lde_pair, coset_lde_to_rev, coset_ntt)
from ..ops.poseidon2 import poseidon2_permute
from ..ops.sponge import hash_rows  # noqa: F401 (re-export convenience)
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
from .device_challenger import DeviceChallenger
from ..refimpl.field import Gl
from ..utils.bits import log2_ceil, log2_strict, reverse_bits_len


def _bitrev_idx(log_n: int) -> jnp.ndarray:
    return jnp.asarray([reverse_bits_len(i, log_n) for i in range(1 << log_n)],
                       jnp.int32)


def _ext_pull(x: GL2):
    """Device GL2 (k,) -> list of (c0, c1) int tuples."""
    c0 = gl.to_u64_np(x.c0)
    c1 = gl.to_u64_np(x.c1)
    if np.ndim(c0) == 0:
        return (int(c0), int(c1))
    return [(int(a), int(b)) for a, b in zip(c0, c1)]


class _MainVec:
    def __init__(self, local_vec, next_vec, width,
                 stage2_local_vec=None, stage2_next_vec=None, s2w=0):
        self.local_vec = local_vec
        self.next_vec = next_vec
        # per-column views for narrow AIRs (Fibonacci-style eval)
        if width <= 64:
            self.trace_local = [local_vec[i] for i in range(width)]
            self.trace_next = [next_vec[i] for i in range(width)]
        else:
            self.trace_local = None
            self.trace_next = None
        if s2w:
            self.stage2_local_vec = stage2_local_vec
            self.stage2_next_vec = stage2_next_vec
            self.stage2_local = [stage2_local_vec[i] for i in range(s2w)]
            self.stage2_next = [stage2_next_vec[i] for i in range(s2w)]
        self.quotient_chunks = []


class TpuProver:
    """Shape-specialized device prover; jitted stages cached per instance."""

    def __init__(self, air: Air, log_n: int, fri_config: FriConfig,
                 lde_mesh=None, lde_log_rows: int = 3,
                 quotient_eval_chunks: int = 1,
                 quotient_col_groups: int = None):
        # lde_mesh: optional 1-D jax.sharding.Mesh; the trace-LDE NTT then
        # runs through the four-step factorization with its row axis on the
        # mesh (all-to-all butterfly exchange over ICI; ops/ntt.py
        # coset_ntt_four_step).  Proof bytes are identical either way
        # (tests/test_ntt.py::test_prover_lde_four_step_sharded).
        # quotient_eval_chunks: evaluate the constraint fold over the
        # quotient domain in this many point segments (lax.map) — wide
        # AIRs' eval intermediates (Keccak gathers (1600, q) bit arrays)
        # dominate peak HBM; chunking divides them by S at identical
        # proof bytes.
        self.air = air
        self.log_n = log_n
        self.fc = fri_config
        self.lde_mesh = lde_mesh
        self.lde_log_rows = lde_log_rows
        self.quotient_eval_chunks = quotient_eval_chunks
        self.width = air.width()
        # multi-stage AIRs: a challenge-sampled second commitment between
        # the trace and quotient commits (air.py; refimpl/prover.py:127-140
        # is the executable spec this path is byte-equal to)
        from ..air import check_multistage_consistency

        check_multistage_consistency(air)
        self.s2w = air.stage2_width()
        self.n_challenges = air.num_challenges()
        self.lqd = log2_ceil(getattr(air, "quotient_degree", lambda: 1)())
        self.n_chunks = 1 << self.lqd
        self.q_log_n = log_n + self.lqd
        self.log_max = log_n + fri_config.log_blowup
        self.g_t = Gl.two_adic_generator(log_n)
        self.g_q = Gl.two_adic_generator(self.q_log_n)
        self.chunk_shifts = [7 * pow(self.g_q, ci, P) % P
                             for ci in range(self.n_chunks)]

        # column-chunk the trace LDE when the unchunked module's
        # compile-time working set would exceed HBM (the recursion-
        # compressed 2^19 x 620 outer trace needs ~18G unchunked — a
        # permanent XLA compile OOM; per-column transforms chunk
        # exactly).  ~4 bufferfuls of (W, N) planar u32 pairs is the
        # observed live-set shape; target <= ~4G per chunk.
        lde_ws = self.width * (1 << self.log_max) * 8 * 4
        self.commit_col_chunks = min(self.width,
                                     -(-lde_ws // (4 << 30)))

        # column-group the chunked-quotient transforms: the strided
        # point segmentation divides the EVAL intermediates by S, but
        # the (W, h) coefficient array and each segment's fold product
        # stay full height — at 2^19 x 620 the quotient module's
        # compile-time working set hit 23.5G (> the 15.75G HBM) even at
        # S=16 (the golden-scale depth-2 wall, BASELINE.md r5).
        # Grouping the per-column transforms under lax.map bounds the
        # live set to ~(W/G, h) at identical proof bytes.  Target ~2G
        # per group across ~4 live bufferfuls.
        if quotient_col_groups is not None:
            self.quotient_col_groups = quotient_col_groups
        else:
            q_ws = self.width * (1 << self.log_n) * 8 * 4
            self.quotient_col_groups = int(min(
                self.width, max(1, -(-q_ws // (2 << 30)))))

        # reduced-opening column-slab width (tests override to force the
        # slab loop at small widths); shrunk adaptively with height in
        # _ro_fn._col_sum.  _bary_col_slab: None = adaptive-with-height
        # (tests set a small value to force the slab loop)
        self._ro_col_slab = 256
        self._bary_col_slab = None

        self._s_commit_trace = jax.jit(self._commit_trace_fn)
        self._s_quotient = jax.jit(self._quotient_fn)
        self._s_commit_chunks = jax.jit(self._commit_chunks_fn)
        self._s_opened = jax.jit(self._opened_fn)
        self._s_ro = jax.jit(self._ro_fn)
        self._grind = jax.jit(self._grind_fn)
        # per-FRI-phase jits (rows/fold-step), keyed by log_folded; host
        # twiddle/inverse tables computed once per shape and closed over
        self._fold_cache: Dict = {}

    def _commit_matrix(self, cols: GL) -> GL:
        """LDE-commit `cols` (W', H) -> (N, W'), column-chunked when the
        shape demands it (bit-identical: the transform is per-column)."""
        S = self.commit_col_chunks
        W_ = cols.shape[0]
        if S <= 1 or W_ < 2 * S or self.lde_mesh is not None:
            return self._s_commit_trace(cols)
        step = -(-W_ // S)
        outs = [self._s_commit_trace(cols[i:i + step])
                for i in range(0, W_, step)]
        return gl.concatenate(outs, axis=-1)

    # ------------------------------------------------------------ stages
    def _commit_trace_fn(self, cols: GL):
        """cols (W, H) on <g_n> -> bit-reversed LDE rows (N, W).

        Width-agnostic (jit re-specializes per shape): serves both the
        main-trace and the stage-2 commitments."""
        if self.lde_mesh is not None:
            n_lde = 1 << self.log_max
            coeffs = coset_intt(cols, 1)
            pad = gl.zeros((cols.shape[0], n_lde - (1 << self.log_n)))
            cpad = gl.concatenate([coeffs, pad], axis=-1)
            from ..ops.ntt import coset_ntt_four_step

            lde = coset_ntt_four_step(
                cpad, 7, log_rows=self.lde_log_rows,
                mesh=self.lde_mesh, axis=self.lde_mesh.axis_names[0])
            lde = lde[:, _bitrev_idx(self.log_max)]
        else:
            # DIF forward emits the Merkle layout directly (one small
            # input gather instead of two full-length ones + the output
            # reversal; ops/ntt.py coset_lde_to_rev)
            lde = coset_lde_to_rev(
                cols, 1, self.log_max - self.log_n)     # (W, N) bitrev
        return GL(lde.lo.T, lde.hi.T)  # (N, W)

    def _quotient_fn(self, cols: GL, alpha: GL2, publics=None,
                     s2_cols: GL = None, challenges=None):
        """Constraint folding over the quotient domain -> ext evals
        (q_size,).  `publics`: GL2-scalar pytree of the AIR's public
        values, a runtime input (see verifier._publics_device).
        Multi-stage AIRs additionally pass the stage-2 columns (s2w, H)
        and the sampled GL2 challenge scalars."""
        q_size = 1 << self.q_log_n
        h = 1 << self.log_n

        # selectors on the quotient coset (two_adic.rs:92-122), vectorized;
        # trace domain shift = 1
        xs_host = [7 % P]
        for _ in range(1, q_size):
            xs_host.append(xs_host[-1] * self.g_q % P)
        xs = gl.from_u64(xs_host)
        zh_host = [(pow(x, h, P) - 1) % P for x in xs_host]
        zh = gl.from_u64(zh_host)
        gen_inv = Gl.inv(self.g_t)
        d_first = gl.sub(xs, gl.ones((q_size,)))
        d_last = gl.sub(xs, gl.full((q_size,), gen_inv))
        invs = gl.inv(gl.stack([d_first, d_last, zh]))    # one instance
        ext0 = lambda b: GL2(b, gl.zeros(b.shape))
        is_first = ext0(gl.mul(zh, invs[0]))
        is_last = ext0(gl.mul(zh, invs[1]))
        is_trans = ext0(d_last)
        inv_zeroifier = invs[2]

        S = self.quotient_eval_chunks
        ext_of = lambda x: GL2(x, gl.zeros(x.shape))
        if S == 1:
            locals_ = coset_lde_pair(
                cols, 1, self.q_log_n - self.log_n)       # (W, q)
            # nexts on the quotient coset are a ROTATION of locals: with
            # g_t = g_q^(2^lqd), p(g_t * 7 * g_q^j) = locals[(j + 2^lqd) % q]
            # — no second full-width NTT and no second (W, q) array (the
            # Keccak HBM floor, VERDICT r2 weak #1)
            nexts = GL(jnp.roll(locals_.lo, -self.n_chunks, axis=-1),
                       jnp.roll(locals_.hi, -self.n_chunks, axis=-1))
            if self.s2w:
                s2_locals = coset_lde_pair(
                    s2_cols, 1, self.q_log_n - self.log_n)  # (s2w, q)
                s2_nexts = GL(
                    jnp.roll(s2_locals.lo, -self.n_chunks, axis=-1),
                    jnp.roll(s2_locals.hi, -self.n_chunks, axis=-1))
            main = _MainVec(
                ext_of(locals_), ext_of(nexts), self.width,
                ext_of(s2_locals) if self.s2w else None,
                ext_of(s2_nexts) if self.s2w else None,
                self.s2w,
            )
            folder = VerifierConstraintFolder(
                ops=gl2.Ops((q_size,)),
                main=main,
                is_first_row=is_first,
                is_last_row=is_last,
                is_transition=is_trans,
                alpha=alpha,
                publics=publics,
                challenges=challenges,
            )
            self.air.eval(folder)
            acc = folder.accumulator                      # (q,) ext
            return gl2.mul_base(acc, inv_zeroifier)

        # chunked (S > 1): STRIDED sub-coset segmentation, lax.map over S
        # segments with one traced eval body.  Segment c is the quotient-
        # domain indices j = c (mod S) — the coset 7*g_q^c * <g_M> with
        # M = q/S — so the segment's trace evals come DIRECTLY from the
        # (W, h) coefficient array by a folded shift-scaled NTT of length
        # M; the full (W, q) locals/nexts arrays (the Keccak HBM floor:
        # 2*(B, 2633, 2^13) live at once) are never materialized.  nexts
        # evaluate the same fold with shift g_t*7*g_q^c.  Values are
        # bit-identical to the unchunked path, reassembled by stride.
        M = q_size // S
        assert M * S == q_size and M >= 1
        # wide traces: compute the per-column coefficient transforms in
        # G column groups (lax.map) so only ~(W/G, h) is live at once;
        # grouped results keep a leading (G, Wc) axis that every step
        # below is generic over, and the group axis is flattened (and
        # the zero-pad columns sliced off) right after the fold NTTs.
        G = self.quotient_col_groups
        Wt = cols.shape[0]
        if G > 1 and Wt >= 2 * G:
            # prefer an exact divisor of Wt near the target: the group
            # reshape then ALIASES the input instead of materializing a
            # zero-padded copy (2.6G at the 2^19 x 620 golden scale)
            for d in range(G, min(2 * G, Wt) + 1):
                if Wt % d == 0:
                    G = d
                    break
            Wc = -(-Wt // G)
            padW = G * Wc - Wt
            gcols = cols
            if padW:
                gcols = gl.concatenate(
                    [gcols, gl.zeros((padW,) + gcols.shape[1:])], axis=0)
            gcols = GL(gcols.lo.reshape((G, Wc) + gcols.shape[1:]),
                       gcols.hi.reshape((G, Wc) + gcols.shape[1:]))
            coeffs = jax.lax.map(
                lambda gc: coset_intt(gc, 1), gcols)      # (G, Wc, h)
        else:
            G = 1
            coeffs = coset_intt(cols, 1)                  # (W, h)
        s2_coeffs = coset_intt(s2_cols, 1) if self.s2w else None
        if M >= h:
            K = 1
            pad = gl.zeros(coeffs.shape[:-1] + (M - h,))
            coeffs = gl.concatenate([coeffs, pad], axis=-1)
            if self.s2w:
                pad2 = gl.zeros(s2_coeffs.shape[:-1] + (M - h,))
                s2_coeffs = gl.concatenate([s2_coeffs, pad2], axis=-1)
        else:
            K = h // M
        # (W, K, M): coefficient a_{m+kM} at [.., k, m]
        c3 = GL(coeffs.lo.reshape(coeffs.shape[:-1] + (K, M)),
                coeffs.hi.reshape(coeffs.shape[:-1] + (K, M)))
        s23 = (GL(s2_coeffs.lo.reshape(s2_coeffs.shape[:-1] + (K, M)),
                  s2_coeffs.hi.reshape(s2_coeffs.shape[:-1] + (K, M)))
               if self.s2w else None)

        # host fold-weight tables: w[c, k, m] = shift_c^(m + kM) with
        # shift_c = 7*g_q^c (locals) / g_t*7*g_q^c (nexts); after the
        # weighted fold over k the segment evals are one PLAIN length-M
        # NTT (the shift is fully absorbed into the weights)
        def _w_tab(mul_shift: int) -> GL:
            out = np.empty((S, K, M), dtype=object)
            for c in range(S):
                s_c = mul_shift * 7 * pow(self.g_q, c, P) % P
                p0 = 1
                for k in range(K):
                    pw = p0
                    for m in range(M):
                        out[c, k, m] = pw
                        pw = pw * s_c % P
                    p0 = p0 * pow(s_c, M, P) % P
            return gl.from_u64(out)

        w_loc = _w_tab(1)                                 # (S, K, M)
        w_nxt = _w_tab(self.g_t)

        def seg(a):
            # strided segment view: a[..., j], j = c + S*t -> (S, ..., M)
            r = a.reshape(a.shape[:-1] + (M, S))
            return jnp.moveaxis(r, -1, 0)

        def seg_gl(x: GL):
            return GL(seg(x.lo), seg(x.hi))

        def seg_ext(x: GL2):
            return GL2(seg_gl(x.c0), seg_gl(x.c1))

        def _fold_ntt(c3_: GL, w: GL) -> GL:
            # sum_k a[.., k, :] * w[k, :]  ->  (.., M), then NTT
            prod = gl.mul(c3_, w)
            acc = prod[..., 0, :]
            for k in range(1, K):
                acc = gl.add(acc, prod[..., k, :])
            return _ntt_flat(acc)

        def _fold_ntt_main(w: GL) -> GL:
            # main-trace fold: group-mapped when G > 1 (c3 is (G, Wc, K,
            # M); one (Wc, K, M) product live at a time), then flattened
            # back to (Wt, M) with the zero-pad columns dropped
            if G == 1:
                return _fold_ntt(c3, w)
            out = jax.lax.map(lambda cg: _fold_ntt(cg, w), c3)
            flat = GL(out.lo.reshape((-1, M)), out.hi.reshape((-1, M)))
            return flat[:Wt]

        xs_seg = (w_loc, w_nxt, seg_ext(is_first), seg_ext(is_last),
                  seg_ext(is_trans), seg_gl(inv_zeroifier))

        def body(args):
            wl, wn, s_first, s_last, s_trans, invz = args
            loc = _fold_ntt_main(wl)
            nxt = _fold_ntt_main(wn)
            main = _MainVec(
                ext_of(loc), ext_of(nxt), self.width,
                ext_of(_fold_ntt(s23, wl)) if self.s2w else None,
                ext_of(_fold_ntt(s23, wn)) if self.s2w else None,
                self.s2w,
            )
            folder = VerifierConstraintFolder(
                ops=gl2.Ops((M,)),
                main=main,
                is_first_row=s_first,
                is_last_row=s_last,
                is_transition=s_trans,
                alpha=alpha,
                publics=publics,
                challenges=challenges,
            )
            self.air.eval(folder)
            return gl2.mul_base(folder.accumulator, invz)

        acc = jax.lax.map(body, xs_seg)                  # (S, M) ext
        # reassemble natural order: out[c + S*t] = acc[c, t]
        flat = lambda a: jnp.moveaxis(a, 0, -1).reshape(
            a.shape[1:-1] + (q_size,))
        return GL2(GL(flat(acc.c0.lo), flat(acc.c0.hi)),
                   GL(flat(acc.c1.lo), flat(acc.c1.hi)))

    def _commit_chunks_fn(self, q_evals: GL2):
        """Split quotient evals into chunks, LDE-commit each as EXT_DEGREE
        base columns; returns concatenated bit-reversed rows (2^l, ch*D).

        Jitted: run eagerly this is hundreds of per-op dispatches (each
        with its own mini-compile over the TPU tunnel) — measured 222s at
        log_n=10 vs seconds jitted."""
        rows_per_chunk = []
        l = self.q_log_n - self.lqd + self.fc.log_blowup
        for ci in range(self.n_chunks):
            ev = q_evals[ci::self.n_chunks]               # (q/ch,) ext
            cols = gl.stack([ev.c0, ev.c1])               # (D, q/ch)
            blow = l - log2_strict(cols.shape[-1])
            lde = coset_lde_to_rev(cols, self.chunk_shifts[ci], blow)
            rows_per_chunk.append(GL(lde.lo.T, lde.hi.T))  # (2^l, D)
        return GL(
            jnp.concatenate([r.lo for r in rows_per_chunk], axis=-1),
            jnp.concatenate([r.hi for r in rows_per_chunk], axis=-1),
        )

    def _fold_phase(self, log_folded: int):
        """(rows_fn, step_fn) for one FRI commit phase, jitted (raw
        closures via _fold_phase_raw for the batch prover's vmap)."""
        key = ("jit", log_folded)
        if key not in self._fold_cache:
            rows_fn, step_fn = self._fold_phase_raw(log_folded)
            self._fold_cache[key] = (jax.jit(rows_fn), jax.jit(step_fn))
        return self._fold_cache[key]

    def _fold_phase_raw(self, log_folded: int):
        """Un-jitted (rows_fn, step_fn) with the phase's host twiddle /
        inverse tables closed over (computed once per shape)."""
        if log_folded not in self._fold_cache:
            m = 1 << log_folded
            g_cur = Gl.two_adic_generator(log_folded + 1)
            x0_host = [pow(g_cur, reverse_bits_len(2 * j, log_folded + 1), P)
                       for j in range(m)]
            den_inv_host = [Gl.inv((P - 2 * x) % P) for x in x0_host]
            x0 = gl.from_u64(x0_host)
            den_inv = gl.from_u64(den_inv_host)

            def rows_fn(u: GL2):
                e0 = u[0::2]
                e1 = u[1::2]
                rows = gl.stack([e0.c0, e0.c1, e1.c0, e1.c1], axis=-1)
                return rows, e0, e1

            def step_fn(e0: GL2, e1: GL2, beta: GL2):
                num = gl2.mul(
                    gl2.sub(e1, e0),
                    gl2.sub_base(gl2.broadcast_to(beta, (m,)), x0),
                )
                return gl2.add(e0, gl2.mul_base(num, den_inv))

            self._fold_cache[log_folded] = (rows_fn, step_fn)
        return self._fold_cache[log_folded]

    def _opened_fn(self, cols: GL, q_evals: GL2, zeta: GL2,
                   s2_cols: GL = None):
        """Opened values at zeta / zeta*g (barycentric, batched).

        Wide+tall traces evaluate in column slabs with the xs /
        inv-denominator tables shared across slabs: the one-shot
        barycentric's (W, H) ext `terms` is ~5.2G at the 2^19 x 620
        composed outer scale.  Per-column math is independent, so the
        slab partition is bit-identical to the one-shot evaluation."""
        zeta_next = gl2.mul_base(zeta, gl.full((), self.g_t))

        def _bary_cols(m: GL, z: GL2) -> GL2:
            n_ = m.shape[-1]
            CH = self._bary_col_slab or max(8, (1 << 29) // (n_ * 16))
            W_ = m.shape[0]
            if W_ <= 2 * CH:
                return barycentric_eval_ext(m, 1, z)
            log_n_ = log2_strict(n_)
            g_ = Gl.two_adic_generator(log_n_)
            xs_host = [1]
            for _ in range(1, n_):
                xs_host.append(xs_host[-1] * g_ % P)
            xs_ = gl.from_u64(xs_host)
            inv_dens = gl2.inv(
                gl2.sub_base(gl2.broadcast_to(z, (n_,)), xs_))
            z_n = gl2.exp_power_of_2(z, log_n_)
            front = gl2.mul_base(
                gl2.sub_base(z_n, gl.ones(())),
                gl.full((), Gl.inv(n_ % P)))
            outs = []
            for i in range(0, W_, CH):
                weights = gl.mul(m[i:i + CH], xs_)
                terms = gl2.mul_base(
                    gl2.broadcast_to(inv_dens, weights.shape), weights)
                while terms.c0.lo.shape[-1] > 1:
                    half = terms.c0.lo.shape[-1] // 2
                    terms = gl2.add(terms[..., :half], terms[..., half:])
                tot = GL2(terms.c0[..., 0], terms.c1[..., 0])
                outs.append(gl2.mul(
                    gl2.broadcast_to(front, tot.shape), tot))
            return GL2(
                GL(jnp.concatenate([o.c0.lo for o in outs]),
                   jnp.concatenate([o.c0.hi for o in outs])),
                GL(jnp.concatenate([o.c1.lo for o in outs]),
                   jnp.concatenate([o.c1.hi for o in outs])))

        tl = _bary_cols(cols, zeta)                         # (W,)
        tn = _bary_cols(cols, zeta_next)                    # (W,)
        qc = []
        for ci in range(self.n_chunks):
            ev = q_evals[ci::self.n_chunks]
            chunk_cols = gl.stack([ev.c0, ev.c1])           # (D, q/ch)
            qc.append(barycentric_eval_ext(chunk_cols, self.chunk_shifts[ci], zeta))
        if self.s2w:
            s2l = barycentric_eval_ext(s2_cols, 1, zeta)        # (s2w,)
            s2n = barycentric_eval_ext(s2_cols, 1, zeta_next)   # (s2w,)
            return tl, tn, gl2.stack(qc), s2l, s2n
        return tl, tn, gl2.stack(qc)                        # qc: (ch, D)

    def _stage2_cols(self, cols: GL, trace_rows_host, challenges_d) -> GL:
        """Stage-2 columns (s2w, H) from the main trace + challenges.

        Airs exposing `build_stage2_device(cols, challenges)` stay fully
        device-resident; otherwise the sampled challenges sync to host
        once and the host callback Air.build_stage2 runs (identical
        values either way — asserted byte-equal against refimpl)."""
        build_dev = getattr(self.air, "build_stage2_device", None)
        if build_dev is not None:
            return build_dev(cols, challenges_d)
        challenges = [_ext_pull(c) for c in challenges_d]
        if isinstance(trace_rows_host, GL):
            trace_rows_host = gl.to_u64_np(
                GL(trace_rows_host.lo.T, trace_rows_host.hi.T)).tolist()
        s2 = self.air.build_stage2(trace_rows_host, challenges)
        return gl.from_u64(np.asarray(
            [[v % P for v in col] for col in s2], dtype=object))

    def _ro_fn(self, trace_rows: GL, q_rows: GL, tl: GL2, tn: GL2, qc: GL2,
               zeta: GL2, alpha_fri: GL2, s2_rows: GL = None,
               s2l: GL2 = None, s2n: GL2 = None):
        """FRI input vector at max height (bit-reversed order), grouped the
        same way as the verifier's reduced openings."""
        n = 1 << self.log_max
        g = Gl.two_adic_generator(self.log_max)
        xs_host = [7 * pow(g, reverse_bits_len(i, self.log_max), P) % P
                   for i in range(n)]
        xs = gl.from_u64(xs_host)                           # (N,)
        zeta_next = gl2.mul_base(zeta, gl.full((), self.g_t))

        w = self.width
        s2w = self.s2w
        D = EXT_DEGREE
        T = 2 * w + 2 * s2w + self.n_chunks * D

        def _pow_body(acc, _):
            return gl2.mul(acc, alpha_fri), acc

        _, pow_stack = jax.lax.scan(_pow_body, gl2.ones(()), None, length=T)

        qc_flat = GL2(qc.c0.reshape(-1), qc.c1.reshape(-1))
        groups = [
            (trace_rows, tl, zeta, 0),
            (trace_rows, tn, zeta_next, w),
        ]
        if s2w:
            groups.append((s2_rows, s2l, zeta, 2 * w))
            groups.append((s2_rows, s2n, zeta_next, 2 * w + s2w))
        groups.append((q_rows, qc_flat, zeta, 2 * w + 2 * s2w))

        def _slab_sum(px: GL, pz: GL2, cf: GL2) -> GL2:
            C = px.shape[-1]
            num = gl2.add_base(
                gl2.broadcast_to(gl2.neg(pz), (n, C)), px
            )
            weighted = gl2.mul(gl2.broadcast_to(cf, (n, C)), num)
            acc = weighted
            while acc.c0.lo.shape[-1] > 1:
                m = acc.c0.lo.shape[-1]
                mm = 1 << (m - 1).bit_length()
                if mm != m:
                    z_pad = gl2.zeros(acc.c0.lo.shape[:-1] + (mm - m,))
                    acc = GL2(
                        gl.concatenate([acc.c0, z_pad.c0], axis=-1),
                        gl.concatenate([acc.c1, z_pad.c1], axis=-1),
                    )
                half = acc.c0.lo.shape[-1] // 2
                acc = gl2.add(acc[..., :half], acc[..., half:])
            return GL2(acc.c0[..., 0], acc.c1[..., 0])

        def _col_sum(p_at_x: GL, p_at_z: GL2, coef: GL2) -> GL2:
            """sum_c coef_c * (p_c(x) - p_c(z)) over the column axis.

            Wide matrices (Keccak: C=2633 at n=2^13 rows) stream in
            column slabs — the one-shot (n, C) ext temporary (5.5GB at
            keccak B=16) is the reduced-opening HBM peak otherwise.
            Slabs are UNROLLED static slices, so XLA reads each (n, CH)
            slab straight from the committed rows (the earlier scan
            formulation materialized a padded + transposed copy of the
            whole matrix — a second ~13G live set at the 2^20 x 620
            composed outer scale), and CH shrinks with height to keep
            each slab's ext temporaries ~0.5G.  GF(p) addition is exact
            and associative, so any slab partition is value-identical."""
            C = p_at_x.shape[-1]
            CH = self._ro_col_slab
            while n * CH * 16 > (1 << 29) and CH > 32:
                CH //= 2
            if C <= 2 * CH:
                return _slab_sum(p_at_x, p_at_z, coef)
            acc = gl2.zeros((n,))
            for i in range(0, C, CH):
                acc = gl2.add(acc, _slab_sum(
                    p_at_x[:, i:i + CH], p_at_z[i:i + CH],
                    coef[i:i + CH]))
            return acc

        ro = gl2.zeros((n,))
        dens = []
        sums = []
        for p_at_x, p_at_z, z, k0 in groups:
            C = p_at_x.shape[-1]
            coef = pow_stack[k0:k0 + C]
            sums.append(_col_sum(p_at_x, p_at_z, coef))
            dens.append(gl2.add_base(gl2.broadcast_to(gl2.neg(z), (n,)), xs))
        inv_dens = gl2.inv(gl2.stack(dens))
        for gi in range(len(groups)):
            ro = gl2.add(ro, gl2.mul(sums[gi], inv_dens[gi]))
        return ro

    def _grind_fn(self, state_rest: GL, base):
        """Try 2^16 PoW witnesses [base, base+2^16): returns (found_any,
        first_offset) for witness w s.t. permute([w, state])[11] has its
        low `proof_of_work_bits` bits zero."""
        B = 1 << 16
        w_lo = jnp.arange(B, dtype=jnp.uint32) + base.astype(jnp.uint32)
        # witnesses < 2^32 in this search window
        lanes_lo = jnp.concatenate(
            [w_lo[:, None], jnp.broadcast_to(state_rest.lo[None, :], (B, 11))],
            axis=1,
        )
        lanes_hi = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.uint32),
             jnp.broadcast_to(state_rest.hi[None, :], (B, 11))],
            axis=1,
        )
        out = poseidon2_permute(GL(lanes_lo, lanes_hi))
        bits = self.fc.proof_of_work_bits
        ok = (out.lo[:, 11] & np.uint32((1 << min(bits, 32)) - 1)) == 0
        if bits > 32:
            ok &= (out.hi[:, 11] & np.uint32((1 << (bits - 32)) - 1)) == 0
        return jnp.any(ok), jnp.argmax(ok)

    # ---------------------------------------------------------- warmup
    def warmup(self, max_workers: int = 8) -> None:
        """Compile every stage/phase/tree module CONCURRENTLY on zero-filled
        inputs.  First-proof latency is dominated by module COUNT times the
        fixed remote-compile latency of the TPU toolchain (~25s/module
        serial; ~3x faster with parallel requests — measured 6 modules in
        8.6s parallel vs 24.9s serial), so a threaded warmup pass
        front-loads all of it.  No-op cost when modules are already
        compiled."""
        from concurrent.futures import ThreadPoolExecutor

        from ..ops.mmcs import _build_tree, _open_paths

        fc = self.fc
        W, H = self.width, 1 << self.log_n
        N = 1 << self.log_max
        qsize = 1 << self.q_log_n
        l = self.q_log_n - self.lqd + fc.log_blowup
        Q = fc.num_queries

        def z(shape):
            zz = jnp.zeros(shape, jnp.uint32)
            return GL(zz, zz)

        def ze(shape):
            return GL2(z(shape), z(shape))

        s2w = self.s2w
        chs = [ze(()) for _ in range(self.n_challenges)]
        s2c = z((s2w, H)) if s2w else None
        cstep = (-(-W // self.commit_col_chunks)
                 if self.commit_col_chunks > 1 and W >= 2 * self.commit_col_chunks
                 else W)
        commit_shapes = sorted({cstep, W - (W // cstep) * cstep or cstep})
        calls = [
            *(lambda wc=wc: self._s_commit_trace(z((wc, H)))
              for wc in commit_shapes),
            lambda: self._s_quotient(
                z((W, H)), ze(()),
                {k: ze(()) for k in self.air.public_values()},
                s2c, chs),
            lambda: self._s_commit_chunks(ze((qsize,))),
            lambda: self._s_opened(z((W, H)), ze((qsize,)), ze(()), s2c),
            lambda: self._s_ro(z((N, W)), z((1 << l, self.n_chunks * EXT_DEGREE)),
                               ze((W,)), ze((W,)),
                               ze((self.n_chunks, EXT_DEGREE)), ze(()), ze(()),
                               z((N, s2w)) if s2w else None,
                               ze((s2w,)) if s2w else None,
                               ze((s2w,)) if s2w else None),
            lambda: self._grind(z((11,)), jnp.uint32(0)),
        ]
        tree_heights = [(N, W), (1 << l, self.n_chunks * EXT_DEGREE)]
        if s2w:
            calls.append(lambda: self._s_commit_trace(z((s2w, H))))
            tree_heights.append((N, s2w))
        for log_folded in range(self.log_max - 1, fc.log_blowup - 1, -1):
            m = 1 << log_folded
            tree_heights.append((m, 4))
            rows_fn, step_fn = self._fold_phase(log_folded)
            calls.append(lambda rf=rows_fn, mm=m: rf(ze((2 * mm,))))
            calls.append(lambda sf=step_fn, mm=m: sf(ze((mm,)), ze((mm,)), ze(())))
        for shape in tree_heights:
            calls.append(lambda s=shape: _build_tree(z(s)))
            levels = []
            k = shape[0]
            while True:
                levels.append(z((k, 4)))
                if k == 1:
                    break
                k //= 2
            calls.append(lambda lv=tuple(levels):
                         _open_paths(lv, jnp.zeros((Q,), jnp.uint32)))

        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            list(ex.map(lambda c: jax.block_until_ready(c()), calls))

    # ------------------------------------------------------------ prove
    def prove(self, trace_rows_host: List[List[int]]) -> Proof:
        """The whole transcript runs DEVICE-RESIDENT (DeviceChallenger):
        Merkle roots feed observes and sampled challenges feed the next
        stage as device scalars, so the pipeline streams with no
        device->host synchronization until the PoW grind; host-pulling
        each phase's root cost one blocking tunnel round trip per FRI
        phase."""
        fc = self.fc
        H = 1 << self.log_n
        ch = DeviceChallenger()

        if isinstance(trace_rows_host, GL):
            cols = trace_rows_host                # device columns (W, H)
            assert cols.shape == (self.width, H), cols.shape
        else:
            assert (len(trace_rows_host) == H
                    and len(trace_rows_host[0]) == self.width)
            if (isinstance(trace_rows_host, np.ndarray)
                    and trace_rows_host.dtype != object):
                cols_np = trace_rows_host.T       # numeric fast path
            else:
                # python-int rows: attempt the exact uint64 coercion
                # first — the object-array path loops per element and
                # dominated 2^20 proves (6.9s -> 2.6s steady, r5
                # measurement).  numpy 2 raises OverflowError on
                # negatives or >= 2^64, so out-of-range values fall back
                # to the exact object path with identical semantics
                # (from_u64 reduces mod p either way).
                try:
                    cols_np = np.asarray(trace_rows_host,
                                         dtype=np.uint64).T
                except (OverflowError, TypeError, ValueError):
                    cols_np = np.asarray(trace_rows_host, dtype=object).T
            cols = gl.from_u64(cols_np)

        # commit trace
        trace_rows = self._commit_matrix(cols)                  # (N, W)
        trace_tree = DeviceMerkleTree(trace_rows)
        ch.observe_many(trace_tree.root)

        # stage 2 (multi-stage AIRs): sample challenges, build + commit the
        # challenge-dependent second matrix (refimpl/prover.py:127-140)
        challenges_d = [ch.sample_ext() for _ in range(self.n_challenges)]
        s2_cols = s2_rows = s2_tree = None
        if self.s2w:
            s2_cols = self._stage2_cols(cols, trace_rows_host, challenges_d)
            s2_rows = self._commit_matrix(s2_cols)              # (N, s2w)
            s2_tree = DeviceMerkleTree(s2_rows)
            ch.observe_many(s2_tree.root)

        alpha_d = ch.sample_ext()

        # quotient
        from ..verifier import _publics_device

        q_evals = self._s_quotient(cols, alpha_d,
                                   _publics_device(self.air),
                                   s2_cols, challenges_d)       # (q,) ext
        q_rows = self._s_commit_chunks(q_evals)
        quotient_tree = DeviceMerkleTree(q_rows)
        ch.observe_many(quotient_tree.root)
        zeta_d = ch.sample_ext()

        # opened values (stay on device; pulled at assembly)
        if self.s2w:
            tl, tn, qc, s2l, s2n = self._s_opened(cols, q_evals, zeta_d,
                                                  s2_cols)
        else:
            tl, tn, qc = self._s_opened(cols, q_evals, zeta_d)
            s2l = s2n = None

        # FRI
        alpha_fri_d = ch.sample_ext()
        u = self._s_ro(trace_rows, q_rows, tl, tn, qc, zeta_d, alpha_fri_d,
                       s2_rows, s2l, s2n)

        commit_phase_trees = []
        commit_phase_vectors = []
        for log_folded in range(self.log_max - 1, fc.log_blowup - 1, -1):
            rows_fn, step_fn = self._fold_phase(log_folded)
            rows, e0, e1 = rows_fn(u)                       # (m, 4), (m,) ext
            tree = DeviceMerkleTree(rows)
            commit_phase_trees.append(tree)
            commit_phase_vectors.append(u)
            ch.observe_many(tree.root)
            beta_d = ch.sample_ext()
            u = step_fn(e0, e1, beta_d)

        # low-degree check flag, asserted at assembly
        low_degree_ok = jnp.all(gl2.eq(u, gl2.broadcast_to(
            GL2(u.c0[0], u.c1[0]), u.c0.shape)))

        # PoW grind (sequential witness order, device-batched windows);
        # the per-window `found` pull is the first sync of the proof — by
        # now the whole pipeline above is enqueued and draining
        assert not ch.input_buffer
        state_rest = ch.state[1:12]
        pow_witness = None
        base = 0
        while pow_witness is None:
            found, off = self._grind(state_rest, jnp.uint32(base))
            if bool(np.asarray(found)):
                pow_witness = base + int(np.asarray(off))
            else:
                base += 1 << 16
                assert base < (1 << 40), "PoW grind runaway"
        ch.observe(gl.from_u64([pow_witness])[0])
        pow_ok = ch.sample_bits(fc.proof_of_work_bits) == 0

        # queries: one jitted dispatch for all index samples
        qidx = ch.sample_many_bits(fc.num_queries, self.log_max)

        # ---- assembly: EVERY device->host pull batched into one
        # device_get (each individual np.asarray is a blocking tunnel
        # round trip, ~70ms; the ~45 of them here dominated single-proof
        # latency — measured 3.9s re-prove with only 0.46s of pipeline)
        pulls = {
            "pow_ok": pow_ok,
            "low_degree_ok": low_degree_ok,
            "qidx": qidx,
            "trace_root": trace_tree.root,
            "q_root": quotient_tree.root,
            "phase_roots": [t.root for t in commit_phase_trees],
            "tl": tl, "tn": tn, "qc": qc,
            "final": GL2(u.c0[0], u.c1[0]),
            "trace_open_rows": trace_rows[qidx],
            "q_open_rows": q_rows[qidx],
            "trace_paths": trace_tree.open_paths(qidx),
            "q_paths": quotient_tree.open_paths(qidx),
        }
        if self.s2w:
            pulls["s2_root"] = s2_tree.root
            pulls["s2l"], pulls["s2n"] = s2l, s2n
            pulls["s2_open_rows"] = s2_rows[qidx]
            pulls["s2_paths"] = s2_tree.open_paths(qidx)
        idx_l = qidx
        for l, tree in enumerate(commit_phase_trees):
            pulls[f"fold_sib_{l}"] = commit_phase_vectors[l][idx_l ^ 1]
            pulls[f"fold_paths_{l}"] = tree.open_paths(idx_l >> 1)
            idx_l = idx_l >> 1
        host = jax.device_get(pulls)

        assert bool(host["pow_ok"]), "PoW self-check failed"
        assert bool(host["low_degree_ok"]), "FRI input not low-degree"

        def ext_pull_h(x: GL2):
            c0 = gl.to_u64_np(x.c0)
            c1 = gl.to_u64_np(x.c1)
            if c0.ndim == 0:
                return (int(c0), int(c1))
            return [(int(a), int(b)) for a, b in zip(c0, c1)]

        trace_commit = [int(v) for v in gl.to_u64_np(host["trace_root"])]
        quotient_commit = [int(v) for v in gl.to_u64_np(host["q_root"])]
        commit_phase_commits = [
            Commitment(value=[int(v) for v in gl.to_u64_np(r)])
            for r in host["phase_roots"]
        ]
        qc_h = host["qc"]
        opened = OpenedValues(
            trace_local=ext_pull_h(host["tl"]),
            trace_next=ext_pull_h(host["tn"]),
            quotient_chunks=[
                ext_pull_h(GL2(qc_h.c0[ci], qc_h.c1[ci]))
                for ci in range(self.n_chunks)
            ],
            stage2_local=ext_pull_h(host["s2l"]) if self.s2w else None,
            stage2_next=ext_pull_h(host["s2n"]) if self.s2w else None,
        )
        final_poly = ext_pull_h(host["final"])
        query_indices = [int(v) for v in host["qidx"]]

        trace_open_rows = gl.to_u64_np(host["trace_open_rows"])  # (Q, W)
        q_open_rows = gl.to_u64_np(host["q_open_rows"])          # (Q, ch*D)
        trace_paths = gl.to_u64_np(host["trace_paths"])
        q_paths = gl.to_u64_np(host["q_paths"])
        fold_sibs = [ext_pull_h(host[f"fold_sib_{l}"])
                     for l in range(len(commit_phase_trees))]
        fold_paths = [gl.to_u64_np(host[f"fold_paths_{l}"])
                      for l in range(len(commit_phase_trees))]

        if self.s2w:
            s2_open_rows = gl.to_u64_np(host["s2_open_rows"])    # (Q, s2w)
            s2_paths = gl.to_u64_np(host["s2_paths"])

        D = EXT_DEGREE
        query_openings = []
        query_proofs = []
        for qi, idx in enumerate(query_indices):
            batches = [
                BatchOpening(
                    opened_values=[[int(v) for v in trace_open_rows[qi]]],
                    opening_proof=[[int(v) for v in sib]
                                   for sib in trace_paths[qi]],
                ),
            ]
            if self.s2w:
                batches.append(BatchOpening(
                    opened_values=[[int(v) for v in s2_open_rows[qi]]],
                    opening_proof=[[int(v) for v in sib]
                                   for sib in s2_paths[qi]],
                ))
            batches.append(
                BatchOpening(
                    opened_values=[
                        [int(q_open_rows[qi][ci * D + e]) for e in range(D)]
                        for ci in range(self.n_chunks)
                    ],
                    opening_proof=[[int(v) for v in sib]
                                   for sib in q_paths[qi]],
                ),
            )
            query_openings.append(batches)
            steps = []
            for l in range(len(commit_phase_trees)):
                steps.append(CommitPhaseProofStep(
                    sibling_value=fold_sibs[l][qi],
                    opening_proof=[[int(v) for v in sib]
                                   for sib in fold_paths[l][qi]],
                ))
            query_proofs.append(QueryProof(commit_phase_openings=steps))

        return Proof(
            commitments=Commitments(
                trace=Commitment(value=trace_commit),
                quotient_chunks=Commitment(value=quotient_commit),
                stage2=(Commitment(value=[
                    int(v) for v in gl.to_u64_np(host["s2_root"])])
                    if self.s2w else None),
            ),
            opened_values=opened,
            opening_proof=TwoAdicFriPcsProof(
                fri_proof=FriProof(
                    commit_phase_commits=commit_phase_commits,
                    query_proofs=query_proofs,
                    final_poly=final_poly,
                    pow_witness=pow_witness,
                ),
                query_openings=query_openings,
            ),
            degree_bits=self.log_n,
        )


_prover_cache: Dict = {}


def prove_on_device(air: Air, trace_rows,
                    fri_config: FriConfig, warmup: bool = True) -> Proof:
    """trace_rows: row-major host rows/ndarray, or a device GL of
    COLUMNS (width, height)."""
    if isinstance(trace_rows, GL):
        log_n = log2_strict(trace_rows.shape[1])
    else:
        log_n = log2_strict(len(trace_rows))
    key = (air.name(), air.width(), log_n, fri_config.log_blowup,
           fri_config.num_queries, fri_config.proof_of_work_bits,
           air.stage2_width(), air.num_challenges())
    p = _prover_cache.get(key)
    if p is None:
        # auto-segment the quotient eval when the (W x q_size) ext
        # working set would not fit HBM comfortably — the recursion-
        # compressed outer VerifierAir trace (2^19 x 618, r5) needs ~16
        # segments; small shapes keep the unsegmented single-dispatch
        # path.  Bit-identical either way (tests/test_tpu_prover.py
        # chunked-quotient equality).
        lqd = log2_ceil(getattr(air, "quotient_degree", lambda: 1)())
        q_size = 1 << (log_n + lqd)
        ws = air.width() * q_size * 8 * 2 * 2    # locals+nexts, ext
        chunks = 1
        while ws // chunks > (1 << 31) and chunks < q_size:
            chunks *= 2
        p = TpuProver(air, log_n, fri_config, quotient_eval_chunks=chunks)
        # concurrent warmup only pays where compiles go to the remote TPU
        # service; on CPU the thread pool just serializes on one core
        if warmup and jax.default_backend() == "tpu":
            p.warmup()
        _prover_cache[key] = p
    else:
        # same-name airs (every HashChainAir names "HashChain") share one
        # cached prover; publics are runtime inputs read from self.air, so
        # refresh it to the caller's instance on every hit.
        p.air = air
    return p.prove(trace_rows)
