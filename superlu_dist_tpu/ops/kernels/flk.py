"""Fused left-looking factorization kernel (one pallas_call per factor).

Motivation (measured, spikes 9-11): the per-level executor is bound by
per-level fixed costs — 3 pallas calls + an XLA diagonal batch per
elimination level ≈ 300µs/level — while most levels hold a single block
(the elimination chain of the top separators is sequential: on lap3d20
*every* level has one block). The per-level structure also forces the
right-looking read-modify-write Schur pattern (4 block transfers per
GEMM + window hazard scheduling).

This kernel restructures the numeric factorization as **left-looking
(fan-in) over write-once targets** inside a single sequential Pallas
grid:

- every stored block (diagonal, L panel, U panel) is a *target* visited
  exactly once, in elimination order (diag k, then step-k panels);
- a target's updates  T -= Σ_j L(I,j)·U(j,k)  accumulate into a VMEM
  resident block across its tape windows (2 HBM reads per GEMM, one
  write per block — no read-modify-write, no duplicate-target windows);
- when a target finishes accumulating it is *finalized in kernel*:
  diagonal blocks run a full-tile Doolittle LU with fused L-inverse and
  a backward U-inverse sweep (ReplaceTinyPivot semantics, reference:
  pdgstrf2.c:142-360); panels multiply by the step's uinv/linv
  (pdCompute_Diag_Inv applied at factor time, pdgstrs.c:842);
- write-after-write/read-after-write hazards are resolved by host-side
  distance analysis: windows whose reads touch blocks finalized fewer
  than two targets earlier carry a sync flag (drain outstanding writes).

The left-looking regroup is exact: a target owned by step m receives
updates only from steps adjacent in the filled pattern, whose
elimination level is strictly lower (symbolic.py step_level), so by the
time target m is visited every contributing panel is final.

Reference analog: this fuses pdgstrf's panel factorization, TRSMs and
Schur updates (pdgstrf.c:243-2003, dSchCompUdt-2Ddynamic.c) into the
TPU-idiomatic form: one kernel, tape-driven, MXU GEMMs, async DMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..host.symbolic import SymbolicPlan
from . import blocklu as _bl

BS = 128
SEG_W = 6000     # windows per pallas_call: the scalar-prefetch tapes
                 # (~92 B/window at Kc=8) must fit SMEM (~1 MiB)

# finalize codes
FIN_NONE = 0
FIN_DIAG = 1
FIN_L = 2     # X <- X @ uinv[step]
FIN_U = 3     # X <- linv[step] @ X


# ---------------------------------------------------------------------------
# host: tape construction
# ---------------------------------------------------------------------------


#: conservative ceiling on the uniform segment window count: the
#: scalar-prefetch tapes cost ~92 B/window at Kc=8 and must fit SMEM
#: (~1 MiB); measured overflow at n=885k: 1.72 MiB requested (a single
#: top elimination step spans >SEG_W windows, so segments cannot be cut
#: small enough). Plans above this run the level-batched XLA hybrid
#: executor (tck stays opt-in via executor="tck").
MAX_SEG_WINDOWS = 10000


def flk_supported(plan: SymbolicPlan, Kc: int = 8) -> bool:
    """Cheap O(nnz) predicate: can the window tapes be segmented into
    SMEM-sized pallas_calls? Segments cut only at elimination-step
    boundaries, so the binding quantity is SEG_W plus the largest single
    step's window count."""
    g_t = np.asarray(plan.g_t, dtype=np.int64)
    nslots = plan.nslots
    counts = np.bincount(g_t, minlength=nslots) if len(g_t) else \
        np.zeros(nslots, np.int64)
    nwin_slot = np.maximum(1, -(-counts // Kc))
    max_step = 0
    for k in range(plan.nb):
        w = int(nwin_slot[plan.diag_slot[k]])
        ls = plan.l_slots[plan.l_ptr[k]:plan.l_ptr[k + 1]]
        us = plan.u_slots[plan.u_ptr[k]:plan.u_ptr[k + 1]]
        w += int(nwin_slot[np.asarray(ls, dtype=np.int64)].sum())
        w += int(nwin_slot[np.asarray(us, dtype=np.int64)].sum())
        max_step = max(max_step, w)
    return SEG_W + max_step <= MAX_SEG_WINDOWS


def build_flk_tapes(plan: SymbolicPlan, Kc: int = 8):
    """Window tape for the fused kernel.

    Returns (tapes: dict of device arrays, consts: dict of ints).
    Window w processes up to Kc contributions into the current target;
    w_first marks the window that loads the target block, w_fin the
    finalize action on the last window of a target.
    """
    nb, nslots = plan.nb, plan.nslots
    g_t = np.asarray(plan.g_t, dtype=np.int64)
    order = np.argsort(g_t, kind="stable")
    gl_s = np.asarray(plan.g_l, dtype=np.int32)[order]
    gu_s = np.asarray(plan.g_u, dtype=np.int32)[order]
    counts = np.bincount(g_t, minlength=nslots) if len(g_t) else \
        np.zeros(nslots, np.int64)
    cptr = np.zeros(nslots + 1, dtype=np.int64)
    cptr[1:] = np.cumsum(counts)

    # target sequence: diag k, then L panels of k, then U panels of k
    l_ptr, u_ptr = plan.l_ptr, plan.u_ptr
    tgt_list = []
    kind_list = []
    step_list = []
    for k in range(nb):
        ls = plan.l_slots[l_ptr[k]:l_ptr[k + 1]]
        us = plan.u_slots[u_ptr[k]:u_ptr[k + 1]]
        tgt_list.append(np.array([plan.diag_slot[k]], dtype=np.int64))
        tgt_list.append(np.asarray(ls, dtype=np.int64))
        tgt_list.append(np.asarray(us, dtype=np.int64))
        kind_list.append(np.array([FIN_DIAG], dtype=np.int32))
        kind_list.append(np.full(len(ls), FIN_L, dtype=np.int32))
        kind_list.append(np.full(len(us), FIN_U, dtype=np.int32))
        step_list.append(np.full(1 + len(ls) + len(us), k, dtype=np.int32))
    tgts = np.concatenate(tgt_list) if tgt_list else np.empty(0, np.int64)
    kinds = np.concatenate(kind_list) if kind_list else np.empty(0, np.int32)
    steps = np.concatenate(step_list) if step_list else np.empty(0, np.int32)
    ntgt = len(tgts)

    nwin_t = np.maximum(1, -(-counts[tgts] // Kc))
    wptr = np.zeros(ntgt + 1, dtype=np.int64)
    wptr[1:] = np.cumsum(nwin_t)
    nw = int(wptr[-1])

    w_tgt = np.empty(nw, dtype=np.int32)
    w_step = np.empty(nw, dtype=np.int32)
    w_first = np.zeros(nw, dtype=np.int32)
    w_fin = np.zeros(nw, dtype=np.int32)
    w_nc = np.zeros(nw, dtype=np.int32)
    c_a = np.full(nw * Kc, plan.zero_slot, dtype=np.int32)
    c_b = np.full(nw * Kc, plan.zero_slot, dtype=np.int32)

    for t in range(ntgt):
        w0, w1 = int(wptr[t]), int(wptr[t + 1])
        sl = int(tgts[t])
        lo, hi = int(cptr[sl]), int(cptr[sl + 1])
        w_tgt[w0:w1] = sl
        w_step[w0:w1] = steps[t]
        w_first[w0] = 1
        w_fin[w1 - 1] = kinds[t]
        pos = lo
        for w in range(w0, w1):
            m = min(Kc, hi - pos)
            w_nc[w] = m
            if m:
                c_a[w * Kc:w * Kc + m] = gl_s[pos:pos + m]
                c_b[w * Kc:w * Kc + m] = gu_s[pos:pos + m]
            pos += m

    # ---- hazard analysis: which windows must NOT be prefetched ----
    # The kernel prefetches window w+1's contribution blocks while window
    # w computes/finalizes. At prefetch time every finalize up to target
    # t(w)-1 has landed (writes are waited inside their window), but t(w)
    # itself finalizes AFTER the prefetch is issued. A window whose reads
    # touch a block finalized at target >= t(w) = t(w+1)-1 (or t(w+1) when
    # w+1 continues the same target) therefore carries a sync flag and
    # loads its contributions synchronously at its own step instead.
    SYNC_DIST = 2
    w_sync = np.zeros(nw, dtype=np.int32)
    # reads: contribution lanes read pool[c_a], pool[c_b]
    lane_w = np.repeat(np.arange(nw, dtype=np.int64), Kc)
    w_of_tgt = np.zeros(nw, dtype=np.int64)      # target index per window
    for t in range(ntgt):
        w_of_tgt[wptr[t]:wptr[t + 1]] = t
    fin_tgt_of_slot = np.full(nslots + 2, -(10 ** 9), dtype=np.int64)
    fin_tgt_of_slot[tgts] = np.arange(ntgt)

    for src in (c_a, c_b):
        prod_t = fin_tgt_of_slot[src]            # (nw*Kc,)
        close = prod_t >= (w_of_tgt[lane_w] - (SYNC_DIST - 1))
        np.logical_or.at(w_sync, lane_w[close], True)
    # (panel finalizes read the step's linv/uinv from the VMEM cache the
    # diagonal finalize left behind — no HBM read, no hazard)

    nbp = _bl.bucket125(plan.nb)

    # ---- segment at elimination-step boundaries (the diag target's
    # first window — the step's panel finalizes reuse the VMEM-cached
    # linv/uinv its diag left behind, so a cut inside a step would lose
    # them). One pallas_call per segment keeps the scalar-prefetch tapes
    # inside SMEM (~1 MiB) at any problem size; pool/linv/uinv alias
    # through the chain. ----
    is_diag_tgt = np.zeros(ntgt, dtype=bool)
    pos_t = 0
    for k in range(nb):
        is_diag_tgt[pos_t] = True
        pos_t += 1 + (plan.l_ptr[k + 1] - plan.l_ptr[k]) \
            + (plan.u_ptr[k + 1] - plan.u_ptr[k])
    step_start_w = wptr[:-1][is_diag_tgt] if ntgt else np.empty(0, np.int64)

    cuts = [0]
    for w0 in step_start_w:
        if w0 - cuts[-1] >= SEG_W:
            cuts.append(int(w0))
    cuts.append(nw)

    # every segment pads to ONE uniform size: a single Mosaic compile
    # serves the whole chain (padding windows have nc == 0 and cost only
    # a branch)
    uni = _bl.bucket125(max(hi - lo for lo, hi in
                            zip(cuts[:-1], cuts[1:])), lo=128)

    def pack(lo, hi):
        seg = hi - lo
        nwp = uni
        pad = nwp - seg

        def p(a, fill=0, w=1):
            a = a[lo * w: hi * w]
            if not pad:
                return jnp.asarray(a)
            return jnp.asarray(np.concatenate(
                [a, np.full(pad * w, fill, a.dtype)]))

        sync = w_sync[lo:hi].copy()
        sync[0] = 1          # no cross-segment prefetch
        if pad:
            sync = np.concatenate([sync, np.ones(pad, sync.dtype)])
        return dict(
            w_tgt=p(w_tgt, plan.trash_slot), w_step=p(w_step, nbp),
            w_first=p(w_first), w_fin=p(w_fin), w_nc=p(w_nc),
            w_sync=jnp.asarray(sync),
            c_a=p(c_a, plan.zero_slot, w=Kc),
            c_b=p(c_b, plan.zero_slot, w=Kc),
        )

    tapes = tuple(pack(lo, hi) for lo, hi in zip(cuts[:-1], cuts[1:]))
    consts = dict(nbp=nbp,
                  poolp=_bl.bucket_fine(plan.nslots + 2, lo=64),
                  seg_nw=tuple(len(t["w_tgt"]) for t in tapes))
    return tapes, consts


# ---------------------------------------------------------------------------
# kernel: in-kernel full-tile LU with fused inverses
# ---------------------------------------------------------------------------


def _lu_tile_inkernel(X, thresh):
    """Doolittle LU of a (bs, bs) tile with fused L-inverse accumulation
    and a backward U-inverse sweep. No pivoting (GESP); tiny pivots are
    replaced by sign(piv)·thresh and counted (pdgstrf2.c ReplaceTinyPivot).
    Returns (LU_compact, linv, uinv, ntiny:f32 (1,1))."""
    m = X.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols = lax.broadcasted_iota(jnp.int32, (m, m), 1)
    one = jnp.ones((), X.dtype)
    zero = jnp.zeros((), X.dtype)
    eye = jnp.where(rows == cols, one, zero)
    colv = rows[:, :1]          # (m,1) row index column
    roww = cols[:1, :]          # (1,m) col index row

    def fwd(j, carry):
        X, R, tiny = carry
        pivrow = jnp.sum(jnp.where(rows == j, X, 0.0), axis=0,
                         keepdims=True)                      # (1,m)
        piv = jnp.sum(jnp.where(roww == j, pivrow, 0.0), axis=1,
                      keepdims=True)                         # (1,1)
        apiv = jnp.abs(piv)
        bad = apiv < thresh
        sgn = jnp.where(apiv > 0.0,
                        piv / jnp.maximum(apiv, jnp.finfo(X.dtype).tiny),
                        1.0)
        piv = jnp.where(bad, sgn * thresh, piv)
        tiny = tiny + jnp.where(bad, jnp.ones_like(tiny),
                                jnp.zeros_like(tiny))
        pivrow = jnp.where(roww == j, piv, pivrow)
        X = jnp.where((rows == j) & (cols == j), piv, X)
        colj = jnp.sum(jnp.where(cols == j, X, 0.0), axis=1,
                       keepdims=True)                        # (m,1)
        factor = jnp.where(colv > j, colj / piv, 0.0)        # (m,1)
        urow = jnp.where(roww > j, pivrow, 0.0)              # (1,m)
        X = X - factor * urow
        X = jnp.where((cols == j) & (rows > j),
                      jnp.broadcast_to(factor, (m, m)), X)
        Rj = jnp.sum(jnp.where(rows == j, R, 0.0), axis=0, keepdims=True)
        R = R - factor * Rj
        return X, R, tiny

    # unroll small recurrences (m is static): removes per-step loop
    # overhead and lets Mosaic pipeline the independent masked reduces
    # across consecutive steps of the serial chain (measured -20% on the
    # whole lap3d32 factor). Not under interpret mode: the 32x trace
    # bloat makes the CPU test path crawl, and the math is identical.
    import os
    unroll = (m <= 32
              and os.environ.get("SLU_TPU_FORCE_PALLAS", "") != "interpret")
    carry = (X, eye, jnp.zeros((1, 1), X.dtype))
    if unroll:
        for j in range(m):
            carry = fwd(jnp.int32(j), carry)
        X, linv, tiny = carry
    else:
        X, linv, tiny = lax.fori_loop(
            jnp.int32(0), jnp.int32(m), fwd, carry)

    # U^{-1} by column-product form: U = (I + C)·D with C = strictU·D^{-1},
    # so U^{-1} = D^{-1}·Π_j (I − c_j e_jᵀ) accumulated for j descending —
    # the same masked-reduce op shapes as the forward loop (no row
    # extraction, no narrow dots).
    def bwd(i, R):
        j = jnp.int32(m - 1) - i
        colj = jnp.sum(jnp.where(cols == j, X, 0.0), axis=1,
                       keepdims=True)                        # (m,1) col j
        piv = jnp.sum(jnp.where(colv == j, colj, 0.0), axis=0,
                      keepdims=True)                         # (1,1) U[j,j]
        factor = jnp.where(colv < j, colj / piv, 0.0)
        Rj = jnp.sum(jnp.where(rows == j, R, 0.0), axis=0, keepdims=True)
        return R - factor * Rj

    if unroll:
        R = eye
        for i in range(m):
            R = bwd(jnp.int32(i), R)
    else:
        R = lax.fori_loop(jnp.int32(0), jnp.int32(m), bwd, eye)
    dcol = jnp.sum(jnp.where(rows == cols, X, 0.0), axis=1, keepdims=True)
    uinv = R / dcol
    return X, linv, uinv, tiny


def _lu_tile_blocked(X, thresh, pb: int = 32):
    """Blocked right-looking LU of an (m, m) tile with full L/U inverses.

    Same math and ReplaceTinyPivot semantics as ``_lu_tile_inkernel`` but
    restructured so the sequential scalar recurrence runs on (pb, pb)
    subtiles (cheap vector ops) while all rank-pb work is MXU dots:
      per panel p: scalar LU+inverses of the (pb,pb) diagonal subtile,
      then L[below,p] = A·ui_p, U[p,right] = li_p·A, trailing GEMM update;
      finally Linv/Uinv assembled by block (back)substitution with the
      per-panel inverses. Measured ~8x faster per diagonal than the
      full-tile scalar Doolittle on TPU (the recurrence touches 16x fewer
      vector registers per step). Reference analog: the blocked panel
      factorization of pdgstrf2_trsm (pdgstrf2.c:142-360).

    Returns (LU_compact, linv, uinv, ntiny:f32 (1,1))."""
    m = X.shape[0]
    if m <= pb:
        return _lu_tile_inkernel(X, thresh)
    P = m // pb
    assert P * pb == m

    def dot(a, b):
        return jnp.dot(a, b, precision="highest",
                       preferred_element_type=X.dtype)

    # right-looking panel sweep on a shrinking trailing block. Only value
    # reads (slices) + concatenates — Mosaic has no in-kernel scatter, so
    # no .at[].set on values.
    lus = []     # per panel: compact LU of the (pb, pb) diagonal subtile
    Lcols = []   # per panel: L[hi:, lo:hi]  (m-hi, pb)
    Urows = []   # per panel: U[lo:hi, hi:]  (pb, m-hi)
    li = []
    ui = []
    tiny = jnp.zeros((1, 1), X.dtype)
    T = X
    for p in range(P):
        lu_pp, li_pp, ui_pp, t = _lu_tile_inkernel(T[:pb, :pb], thresh)
        tiny = tiny + t
        lus.append(lu_pp)
        li.append(li_pp)
        ui.append(ui_pp)
        if p < P - 1:
            Lp = dot(T[pb:, :pb], ui_pp)          # (rest, pb)
            Up = dot(li_pp, T[:pb, pb:])          # (pb, rest)
            Lcols.append(Lp)
            Urows.append(Up)
            T = T[pb:, pb:] - dot(Lp, Up)

    def Lblk(p, q):      # L[p-strip, q-panel], q < p
        off = (p - q - 1) * pb
        return Lcols[q][off:off + pb]

    def Ublk(p, q):      # U[p-strip, q-panel], q > p
        off = (q - p - 1) * pb
        return Urows[p][:, off:off + pb]

    # compact LU rows: [ L[p,0..p-1] | lu_pp | U[p,p+1..] ]
    strips = []
    for p in range(P):
        parts = [Lblk(p, q) for q in range(p)] + [lus[p]]
        if p < P - 1:
            parts.append(Urows[p])
        strips.append(jnp.concatenate(parts, axis=1) if len(parts) > 1
                      else parts[0])
    LU = jnp.concatenate(strips, axis=0)

    rows = lax.broadcasted_iota(jnp.int32, (pb, m), 1)

    def eye_strip(p):
        return jnp.where(
            (rows - jnp.int32(p * pb))
            == lax.broadcasted_iota(jnp.int32, (pb, m), 0),
            jnp.ones((), X.dtype), jnp.zeros((), X.dtype))

    # Linv rows by forward block substitution: row-strip p of L^{-1} is
    # li_p · (E_p − Σ_{q<p} L[p,q] · Linv[q,:])
    lrows = []
    for p in range(P):
        acc = eye_strip(p)
        for q in range(p):
            acc = acc - dot(Lblk(p, q), lrows[q])
        lrows.append(dot(li[p], acc))
    linv = jnp.concatenate(lrows, axis=0)

    # Uinv rows by backward block substitution
    urows = [None] * P
    for p in range(P - 1, -1, -1):
        acc = eye_strip(p)
        for q in range(p + 1, P):
            acc = acc - dot(Ublk(p, q), urows[q])
        urows[p] = dot(ui[p], acc)
    uinv = jnp.concatenate(urows, axis=0)
    return LU, linv, uinv, tiny


def _flk_kernel(Kc, exact, nbp, bs, precision=None):
    # Schur-GEMM pass precision (see clk._clk_kernel): "high" = 3
    # bf16 passes; the diagonal LU stays "highest" (_lu_tile_blocked)
    prec = _bl.resolve_gemm_precision(exact, precision)

    def dot(a, b):
        return jnp.dot(a, b, precision=prec,
                       preferred_element_type=jnp.float32)

    def kern(w_tgt, w_step, w_first, w_fin, w_nc, w_sync, c_a, c_b,
             consts_ref, pool_ref, linv_ref, uinv_ref,
             pool_out, linv_out, uinv_out, tiny_out,
             sT, sA, sB, sLi, sUi, sCnt, semT, semA, semB,
             semWT, semWL, semWU):
        del linv_ref, uinv_ref
        thresh = lax.bitcast_convert_type(
            jnp.full((1, 128), consts_ref[0], jnp.int32),
            jnp.float32)[0, 0]
        w = pl.program_id(0)
        nw = pl.num_programs(0)
        base = w * jnp.int32(Kc)
        first = w_first[w] == 1
        fin = w_fin[w]
        nc = w_nc[w]
        tgt = w_tgt[w]
        step = w_step[w]
        two = jnp.int32(2)
        bank = lax.rem(w, two)
        nbank = lax.rem(w + jnp.int32(1), two)

        def start_reads(b0, cnt, bk):
            # all Kc lanes unconditionally: invalid lanes read the zero
            # block (tape fill = zero_slot), whose product is exactly 0.
            # The per-lane pl.when branches cost more scalar-core time
            # than the wasted DMA bandwidth (the kernel is scalar-bound:
            # noop ablation = 2.2us/window with GEMMs fully hidden).
            # A lanes land side by side in a (bs, Kc*bs) strip so the
            # window's contraction is a single wide matmul.
            del cnt
            for j in range(Kc):
                pltpu.make_async_copy(
                    pool_out.at[c_a[b0 + j]],
                    sA.at[bk, slice(None), pl.ds(j * bs, bs)],
                    semA.at[bk, jnp.int32(j)]).start()
                pltpu.make_async_copy(
                    pool_out.at[c_b[b0 + j]], sB.at[bk, jnp.int32(j)],
                    semB.at[bk, jnp.int32(j)]).start()

        # ---- init persistent state at first grid step ----
        @pl.when(w == 0)
        def _():
            sCnt[...] = jnp.zeros_like(sCnt)

        # ---- own contribution reads, unless window w-1 prefetched them
        # (it did iff w > 0 and w_sync[w] == 0). Windows with nc == 0
        # (zero-contribution targets, segment padding) skip all lane
        # work — padding must be near-free so segments can pad to ONE
        # uniform size (one Mosaic compile for every segment). ----
        @pl.when(((w == 0) | (w_sync[w] == 1)) & (nc > 0))
        def _():
            start_reads(base, nc, bank)

        # ---- load target ----
        @pl.when(first)
        def _():
            pltpu.make_async_copy(pool_out.at[tgt], sT, semT).start()

        # ---- prefetch window w+1's contributions into the other bank
        # while this window computes (hazard windows load at their own
        # step instead — see build_flk_tapes sync analysis) ----
        nxt = jnp.minimum(w + jnp.int32(1), nw - jnp.int32(1))

        @pl.when((w + jnp.int32(1) < nw) & (w_sync[nxt] == 0)
                 & (w_nc[nxt] > 0))
        def _():
            start_reads(nxt * jnp.int32(Kc), w_nc[nxt], nbank)

        @pl.when(first)
        def _():
            pltpu.make_async_copy(pool_out.at[tgt], sT, semT).wait()

        # The window's whole contraction as ONE wide matmul,
        # (bs, Kc·bs)×(Kc·bs, bs): a single scalar-core issue that the
        # MXU executes as Kc accumulation passes. (Earlier forms —
        # per-lane sT RMW, then Kc independent dots + add tree — cost
        # ~15 scalar issues per window; the kernel is scalar-issue-bound
        # at ~80ns/op.) Invalid lanes hold the zero block, so their
        # passes contribute nothing.
        @pl.when(nc > 0)
        def _():
            for j in range(Kc):
                pltpu.make_async_copy(
                    pool_out.at[c_a[base + j]],
                    sA.at[bank, slice(None), pl.ds(j * bs, bs)],
                    semA.at[bank, jnp.int32(j)]).wait()
                pltpu.make_async_copy(
                    pool_out.at[c_b[base + j]], sB.at[bank, jnp.int32(j)],
                    semB.at[bank, jnp.int32(j)]).wait()
            sT[...] = sT[...] - dot(sA[bank],
                                    sB[bank].reshape(Kc * bs, bs))

        # ---- finalize (panel TRSMs read the step's inverses from the
        # VMEM cache left by the step's diagonal finalize, which always
        # precedes them in target order). Write waits stay synchronous:
        # a deferred-wait variant (wait at the next target's first
        # window) measured ~25% SLOWER — the wait at a window top stalls
        # the scalar core's run-ahead DMA issue. ----
        @pl.when(fin == FIN_DIAG)
        def _():
            LU, li, ui, nt = _lu_tile_blocked(sT[...], thresh)
            sT[...] = LU
            sLi[...] = li
            sUi[...] = ui
            sCnt[...] = sCnt[...] + jnp.broadcast_to(nt, sCnt.shape)
            pltpu.make_async_copy(sT, pool_out.at[tgt], semWT).start()
            pltpu.make_async_copy(sLi, linv_out.at[step], semWL).start()
            pltpu.make_async_copy(sUi, uinv_out.at[step], semWU).start()
            pltpu.make_async_copy(sT, pool_out.at[tgt], semWT).wait()
            pltpu.make_async_copy(sLi, linv_out.at[step], semWL).wait()
            pltpu.make_async_copy(sUi, uinv_out.at[step], semWU).wait()

        @pl.when(fin == FIN_L)
        def _():
            sT[...] = dot(sT[...], sUi[...])
            pltpu.make_async_copy(sT, pool_out.at[tgt], semWT).start()
            pltpu.make_async_copy(sT, pool_out.at[tgt], semWT).wait()

        @pl.when(fin == FIN_U)
        def _():
            sT[...] = dot(sLi[...], sT[...])
            pltpu.make_async_copy(sT, pool_out.at[tgt], semWT).start()
            pltpu.make_async_copy(sT, pool_out.at[tgt], semWT).wait()

        # ---- emit the tiny-pivot counter on the last window ----
        @pl.when(w == nw - 1)
        def _():
            pltpu.make_async_copy(sCnt, tiny_out, semWT).start()
            pltpu.make_async_copy(sCnt, tiny_out, semWT).wait()

    return kern


@functools.lru_cache(maxsize=64)
def _flk_seg_call(nw, nbp, poolp, Kc, bs, exact, interpret,
                  precision=None):
    """One segment's pallas_call (pool/linv/uinv alias through)."""
    kern = _flk_kernel(Kc, exact, nbp, bs, precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(nw,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        scratch_shapes=[pltpu.VMEM((bs, bs), jnp.float32),
                        pltpu.VMEM((2, bs, Kc * bs), jnp.float32),
                        pltpu.VMEM((2, Kc, bs, bs), jnp.float32),
                        pltpu.VMEM((bs, bs), jnp.float32),
                        pltpu.VMEM((bs, bs), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((2, Kc)),
                        pltpu.SemaphoreType.DMA((2, Kc)),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
    )

    def seg(consts, pool, linv, uinv, tapes):
        return pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct(pool.shape, pool.dtype),
                jax.ShapeDtypeStruct((nbp + 1, bs, bs), pool.dtype),
                jax.ShapeDtypeStruct((nbp + 1, bs, bs), pool.dtype),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ],
            grid_spec=grid_spec,
            input_output_aliases={9: 0, 10: 1, 11: 2},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(tapes["w_tgt"], tapes["w_step"], tapes["w_first"],
          tapes["w_fin"], tapes["w_nc"], tapes["w_sync"],
          tapes["c_a"], tapes["c_b"], consts, pool, linv, uinv)

    return seg


def build_factor_fn_flk(plan: SymbolicPlan, *, Kc: int = 8,
                        exact: bool = True, interpret: bool = False,
                        precision: str | None = None):
    """Single-call fused factor executor. Same contract as the other
    executors: factor(pool, thresh, tapes) -> (pool, linv, uinv, tiny);
    linv/uinv rows [0, nb) are valid, pool holds the finalized compact
    factors (L panels post-TRSM, U panels post-solve, compact LU diag).

    Any block size with bs % 8 == 0 is accepted; sub-128 blocks trade MXU
    width for a smaller padded flop model (the win for irregular
    matrices — the reference's variable supernode width, relax_snode
    symbfact.c:238-272, recast as a per-matrix block-size choice)."""
    assert plan.bs % 8 == 0, "flk requires block size divisible by 8"
    tapes, consts = build_flk_tapes(plan, Kc)
    nbp, poolp = consts["nbp"], consts["poolp"]
    bs = plan.bs
    segs = [_flk_seg_call(nw, nbp, poolp, Kc, bs, exact, interpret,
                          precision)
            for nw in consts["seg_nw"]]

    seg_fn = segs[0]

    def factor(pool, thresh, tapes):
        consts_a = jnp.reshape(lax.bitcast_convert_type(
            thresh.astype(jnp.float32), jnp.int32), (1,))
        linv = jnp.zeros((nbp + 1, bs, bs), pool.dtype)
        uinv = jnp.zeros((nbp + 1, bs, bs), pool.dtype)
        tiny = jnp.zeros((), jnp.int32)
        if len(tapes) == 1:
            pool, linv, uinv, t = seg_fn(consts_a, pool, linv, uinv,
                                         tapes[0])
            return pool, linv, uinv, t[0, 0].astype(jnp.int32)

        # every segment pads to the same size, so ONE pallas-call
        # instance scans over the stacked tapes: a single Mosaic compile
        # serves the whole chain (33 inlined calls measured 367s to
        # compile at n=125k; the scan compiles once)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *tapes)

        def body(carry, tp):
            pool, linv, uinv, tiny = carry
            p2, l2, u2, t = seg_fn(consts_a, pool, linv, uinv, tp)
            return (p2, l2, u2, tiny + t[0, 0].astype(jnp.int32)), None

        (pool, linv, uinv, tiny), _ = lax.scan(
            body, (pool, linv, uinv, tiny), stacked)
        return pool, linv, uinv, tiny

    return jax.jit(factor, donate_argnums=(0,)), tapes
