"""Column-resident left-looking factorization kernel (clk).

The flk kernel (flk.py) is scalar-issue-bound: every GEMM costs ~4 DMA
descriptor operations (2 starts + 2 waits at ~70-90ns each) plus its
share of window overhead, measured 2.2µs per 8-GEMM window with the MXU
and the DMA engines essentially idle. This kernel restructures the
factorization around the *column panel* so that the per-GEMM scalar
cost collapses:

- the pool is column-major (symbolic._renumber_column_major), so block
  column k — U(i,k) ascending i, diag(k,k), L(i,k) ascending i — is a
  contiguous slot range and its VMEM residency is a handful of
  range DMAs instead of one per block;
- contributions are grouped by SOURCE column: for U(j,k) ≠ 0 the whole
  L-part of column j contributes L(i,j)·U(j,k) into column k's panel
  (the exact-LU fill closure guarantees every row lands on a stored
  block), so one pair (k, j) is ONE contiguous A-range DMA and ONE wide
  (MC·B, B)×(B, B) matmul, with a short in-VMEM scatter of the result
  strip into panel positions;
- the B operand U(j,k) lives in the resident panel itself and is
  finalized in place (linv(j)·U(j,k)) the first time pair j runs —
  every source column j < k has already stored linv(j);
- at column end the diagonal runs the in-kernel blocked LU with fused
  inverses (flk._lu_tile_blocked), the whole L-part TRSMs against
  uinv(k) in VMEM, and the panel stores back with exact range DMAs.

This is the sup-col update of left-looking supernodal LU (the reference
reaches the same shape from the other end: pdgstrf's right-looking
panel pipeline, pdgstrf.c:243-2003, with lookahead buffers playing the
role of the resident panel). Exact LU only: ILU(k) plans drop targets,
which breaks the whole-L-part contiguity — the driver keeps flk there.
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
from .flk import _lu_tile_blocked

# panel capacity (blocks): sPanel + A buffers must fit VMEM (~16MB/core)
PANEL_CAP = 104
PC = 8          # panel load/store chunk (blocks per range DMA)
TC = 8          # column-finalize TRSM chunk (blocks per wide matmul);
                # the chunk may overshoot the column end into panel
                # scratch rows (the panel is sized S+TC for this), so the
                # whole L-part TRSMs in ceil(nl/TC) wide dots instead of
                # nl serial (bs,bs) dots
SEG_JOBS = 6000  # jobs per pallas_call: scalar-prefetch tapes must fit
                 # SMEM (~1 MiB); ~88 B/job keeps a segment near 512 KiB


def clk_supported(plan: SymbolicPlan) -> bool:
    """clk needs the full column panel resident in VMEM."""
    scol = np.asarray(plan.slot_col)
    if len(scol) == 0:
        return False
    ncol = np.bincount(scol, minlength=plan.nb)
    return int(ncol.max()) <= PANEL_CAP


def build_clk_tapes(plan: SymbolicPlan, MC: int = 8):
    """Job tape for the column-resident kernel.

    One job = one (column, source) pair chunk: up to MC contiguous
    L-part rows of the source column, GEMMed against the in-panel B
    block, scattered into panel positions. Column boundaries attach the
    panel load (j_start) / finalize+store (j_fin) actions.
    """
    nb, nslots = plan.nb, plan.nslots
    scol = np.asarray(plan.slot_col)
    srow = np.asarray(plan.slot_row)
    assert np.all(np.diff(scol) >= 0), "clk requires column-major slots"
    colptr = np.searchsorted(scol, np.arange(nb + 1))
    ncol = np.diff(colptr)
    S = int(ncol.max())
    assert S <= PANEL_CAP, "column panel exceeds VMEM capacity"
    # canonicalize the panel height: S only shapes VMEM scratch and the
    # trash row, so bucketing it lets matrices of different max column
    # heights share one Mosaic compile (minutes each through the
    # remote-TPU tunnel)
    S = min(_bl.bucket125(S, lo=16), PANEL_CAP)
    diag_slot = np.asarray(plan.diag_slot)
    dpos = diag_slot - colptr[:nb]           # = #U blocks above the diag
    poolp = _bl.factor_buckets(plan).poolp

    jobs = {k: [] for k in ("start", "fin", "finB", "bpos", "jstep",
                            "a0", "m", "col", "base", "ncol", "dposc",
                            "rshift", "tn", "c1")}
    # (nfull/nrem precomputed per job: Mosaic's int // lowering recurses)
    dst_list = []
    fin_job_of_col = np.full(nb, -1, dtype=np.int64)
    nj = 0

    for k in range(nb):
        base = int(colptr[k])
        nck = int(ncol[k])
        dpk = int(dpos[k])
        rows_k = srow[base:base + nck]       # ascending
        first_of_col = nj
        # pairs: one per U block of column k (source column j = its row)
        for t in range(dpk):
            j = int(rows_k[t])
            la0 = int(diag_slot[j]) + 1      # first L slot of column j
            lm = int(colptr[j + 1]) - la0    # L-part length
            # chunks of MC rows (at least one job: finalize-B)
            nchunk = max(1, -(-lm // MC))
            for c in range(nchunk):
                r0 = c * MC
                m = max(0, min(MC, lm - r0))
                a0 = la0 + r0
                shift = 0
                if a0 + MC > poolp:          # clamp fixed-size read
                    shift = a0 + MC - poolp
                    a0 -= shift
                jobs["start"].append(1 if nj == first_of_col else 0)
                jobs["fin"].append(0)
                jobs["finB"].append(1 if c == 0 else 0)
                jobs["bpos"].append(t)
                jobs["jstep"].append(j)
                jobs["a0"].append(a0)
                jobs["m"].append(m)
                jobs["col"].append(k)
                jobs["base"].append(base)
                jobs["ncol"].append(nck)
                jobs["dposc"].append(dpk)
                jobs["rshift"].append(shift)
                jobs["tn"].append(0)
                d = np.full(MC, S, dtype=np.int32)   # S = panel trash row
                c1 = 0
                if m:
                    rows = srow[a0 + shift: a0 + shift + m]
                    pos = np.searchsorted(rows_k, rows)
                    if not np.all((pos < nck) & (rows_k[pos] == rows)):
                        raise ValueError(
                            "fill closure violated (ILU plan?) — clk "
                            "requires exact-LU symbolic")
                    d[shift: shift + m] = pos
                    # full chunk with contiguous targets: the panel
                    # scatter collapses to ONE (MC,bs,bs) slice update
                    # (measured: the per-row scatter, ~600 ns/row, is
                    # what bounds clk — not the MXU; 33-43% of lap3d
                    # chunks qualify)
                    if (m == MC and shift == 0
                            and np.all(np.diff(pos) == 1)):
                        c1 = 1
                jobs["c1"].append(c1)
                dst_list.append(d)
                nj += 1
        # column finalize job (also the only job for leaf columns)
        jobs["start"].append(1 if nj == first_of_col else 0)
        jobs["fin"].append(1)
        jobs["finB"].append(0)
        jobs["bpos"].append(S)               # trash panel row
        jobs["jstep"].append(k)              # column id for linv/uinv store
        jobs["a0"].append(0)
        jobs["m"].append(0)
        jobs["col"].append(k)
        jobs["base"].append(base)
        jobs["ncol"].append(nck)
        jobs["dposc"].append(dpk)
        jobs["rshift"].append(0)
        jobs["tn"].append(-(-(nck - dpk - 1) // TC))   # TRSM chunk count
        jobs["c1"].append(0)
        dst_list.append(np.full(MC, S, dtype=np.int32))
        fin_job_of_col[k] = nj
        nj += 1

    arr = {k: np.asarray(v, dtype=np.int32) for k, v in jobs.items()}
    dst = np.concatenate(dst_list) if dst_list else np.empty(0, np.int32)

    # ---- hazard analysis: prefetching job J+1's A-range (and linv) is
    # unsafe only if its source column is finalized by job J itself
    # (stores/linv writes are waited inside their job) ----
    sync = np.zeros(nj, dtype=np.int32)
    src_col = np.where(arr["fin"] == 1, -1, arr["jstep"]).astype(np.int64)
    for J in range(1, nj):
        s = src_col[J]
        if s >= 0 and fin_job_of_col[s] >= J - 1:
            sync[J] = 1
    arr["sync"] = sync

    nbp = _bl.bucket125(nb)

    # ---- segment the job stream at column boundaries so each call's
    # scalar-prefetch tapes fit SMEM (~1 MiB total; measured blow-up:
    # lap3d50's flat tape is 7+ MiB and the Mosaic compile rejects it).
    # Each segment is one pallas_call; pool/linv/uinv alias through. ----
    col_first = np.flatnonzero(arr["start"] == 1)
    cuts = [0]
    for j0 in col_first:
        if j0 - cuts[-1] >= SEG_JOBS:
            cuts.append(int(j0))
    cuts.append(nj)

    # uniform segment size: one Mosaic compile serves the whole chain
    # (padding jobs have m == 0 / no flags and cost only branches).
    # lo=128 canonicalizes every small matrix onto one segment shape.
    uni = _bl.bucket125(max(hi - lo for lo, hi in
                            zip(cuts[:-1], cuts[1:])), lo=128)

    def pack(lo, hi):
        seg = hi - lo
        njp = uni
        pad = njp - seg

        def p(a, fill=0, w=1):
            a = a[lo * w: hi * w]
            if not pad:
                return jnp.asarray(a)
            return jnp.asarray(np.concatenate(
                [a, np.full(pad * w, fill, a.dtype)]))

        sync = arr["sync"][lo:hi].copy()
        sync[0] = 1          # no cross-segment prefetch
        nfull = arr["ncol"][lo:hi] // PC
        nrem = arr["ncol"][lo:hi] - nfull * PC
        if pad:
            nfull = np.concatenate([nfull, np.zeros(pad, nfull.dtype)])
            nrem = np.concatenate([nrem, np.ones(pad, nrem.dtype)])
            sync = np.concatenate([sync, np.ones(pad, sync.dtype)])
        return dict(
            j_start=p(arr["start"]), j_fin=p(arr["fin"]),
            j_finB=p(arr["finB"]), j_bpos=p(arr["bpos"], S),
            j_step=p(arr["jstep"], nbp), j_a0=p(arr["a0"]),
            j_m=p(arr["m"]), j_col=p(arr["col"], nbp),
            j_base=p(arr["base"]), j_ncol=p(arr["ncol"], 1),
            j_nfull=jnp.asarray(nfull), j_nrem=jnp.asarray(nrem),
            j_dpos=p(arr["dposc"]), j_tn=p(arr["tn"]),
            j_sync=jnp.asarray(sync), j_c1=p(arr["c1"]),
            dst=p(dst, S, w=MC),
        )

    tapes = tuple(pack(lo, hi) for lo, hi in zip(cuts[:-1], cuts[1:]))
    consts = dict(nbp=nbp, poolp=poolp, S=S,
                  seg_nj=tuple(len(t["j_fin"]) for t in tapes))
    return tapes, consts


def _clk_kernel(MC, S, exact, bs, precision=None):
    # f32 matmuls on the MXU are bf16-pass emulated: "highest" = 6
    # passes, "high" = 3. The pair GEMMs dominate kernel time, and the
    # factorization is a preconditioner for f64-residual refinement —
    # precision "high" trades ~half the GEMM passes for refinement doing
    # one extra cheap iteration (driven by Options.gemm_precision; the
    # driver escalates back to "highest" when refinement stalls). The
    # legacy env SLU_TPU_CLK_GEMM_PRECISION still force-overrides.
    prec = _bl.resolve_gemm_precision(exact, precision)

    def dot(a, b):
        return jnp.dot(a, b, precision=prec,
                       preferred_element_type=jnp.float32)

    def kern(j_start, j_fin, j_finB, j_bpos, j_step, j_a0, j_m, j_col,
             j_base, j_ncol, j_nfull, j_nrem, j_dpos, j_tn, j_sync, j_c1,
             dst, consts_ref,
             pool_ref, linv_ref, uinv_ref,
             pool_out, linv_out, uinv_out, tiny_out,
             sPanel, sL, sLinv, sCnt,
             semP, semA, semI, semW):
        del linv_ref, uinv_ref
        thresh = lax.bitcast_convert_type(
            jnp.full((1, 128), consts_ref[0], jnp.int32),
            jnp.float32)[0, 0]
        J = pl.program_id(0)
        nj = pl.num_programs(0)
        start = j_start[J] == 1
        fin = j_fin[J] == 1
        finB = j_finB[J] == 1
        bpos = j_bpos[J]
        base = j_base[J]
        nck = j_ncol[J]
        two = jnp.int32(2)
        bank = lax.rem(J, two)
        nbank = lax.rem(J + jnp.int32(1), two)

        @pl.when(J == 0)
        def _():
            sCnt[...] = jnp.zeros_like(sCnt)

        def start_reads(j, bk):
            pltpu.make_async_copy(
                pool_out.at[pl.ds(j_a0[j], MC)], sL.at[bk],
                semA.at[bk]).start()

        def start_linv(j, bk):
            pltpu.make_async_copy(
                linv_out.at[j_step[j]], sLinv.at[bk], semI.at[bk]).start()

        # ---- own A-range (and linv) reads unless prefetched by J-1.
        # Jobs with m == 0 (finalize-only, segment padding) skip lane
        # work so uniform segment padding is near-free. ----
        m_act = j_m[J] > 0

        @pl.when(((J == 0) | (j_sync[J] == 1)) & m_act)
        def _():
            start_reads(J, bank)

        @pl.when(((J == 0) | (j_sync[J] == 1)) & finB)
        def _():
            start_linv(J, bank)

        # ---- panel residency: load column range (exact chunks; waits
        # mirror their start descriptors exactly) ----
        nfull = j_nfull[J]
        nrem = j_nrem[J]

        @pl.when(start)
        def _():
            def ld(i, _):
                pltpu.make_async_copy(
                    pool_out.at[pl.ds(base + i * PC, PC)],
                    sPanel.at[pl.ds(i * PC, PC)], semP).start()
                return 0

            lax.fori_loop(0, nfull, ld, 0)

            def ld1(i, _):
                pltpu.make_async_copy(
                    pool_out.at[base + nfull * PC + i],
                    sPanel.at[nfull * PC + i], semP).start()
                return 0

            lax.fori_loop(0, nrem, ld1, 0)

            def wtf(i, _):
                pltpu.make_async_copy(
                    pool_out.at[pl.ds(base + i * PC, PC)],
                    sPanel.at[pl.ds(i * PC, PC)], semP).wait()
                return 0

            lax.fori_loop(0, nfull, wtf, 0)

            def wt1(i, _):
                pltpu.make_async_copy(
                    pool_out.at[base + nfull * PC + i],
                    sPanel.at[nfull * PC + i], semP).wait()
                return 0

            lax.fori_loop(0, nrem, wt1, 0)

        # ---- prefetch next job's A-range / linv into the other bank ----
        nxt = jnp.minimum(J + jnp.int32(1), nj - jnp.int32(1))

        @pl.when((J + jnp.int32(1) < nj) & (j_sync[nxt] == 0)
                 & (j_m[nxt] > 0))
        def _():
            start_reads(nxt, nbank)

        @pl.when((J + jnp.int32(1) < nj) & (j_sync[nxt] == 0)
                 & (j_finB[nxt] == 1))
        def _():
            start_linv(nxt, nbank)



        # ---- finalize B in place: U(j,k) <- linv(j) @ U(j,k) ----
        @pl.when(finB)
        def _():
            pltpu.make_async_copy(
                linv_out.at[j_step[J]], sLinv.at[bank],
                semI.at[bank]).wait()
            sPanel[bpos] = dot(sLinv[bank], sPanel[bpos])

        # ---- the pair GEMM: one wide matmul + short panel scatter
        # (the A wait matches the single range copy). Full chunks with
        # contiguous targets (j_c1) write back as ONE slice update —
        # the per-row scatter (~600 ns/row measured) is clk's bound,
        # not the MXU ----
        @pl.when(m_act)
        def _():
            pltpu.make_async_copy(
                pool_out.at[pl.ds(j_a0[J], MC)], sL.at[bank],
                semA.at[bank]).wait()
            R = dot(sL[bank].reshape(MC * bs, bs), sPanel[bpos])
            doff = J * jnp.int32(MC)

            @pl.when(j_c1[J] == 1)
            def _():
                p0 = dst[doff]
                sPanel[pl.ds(p0, MC)] = (sPanel[pl.ds(p0, MC)]
                                         - R.reshape(MC, bs, bs))

            @pl.when(j_c1[J] == 0)
            def _():
                for r in range(MC):
                    dd = dst[doff + r]
                    sPanel[dd] = sPanel[dd] - R[r * bs:(r + 1) * bs]

        # ---- column finalize: diag LU + L TRSM + panel store ----
        @pl.when(fin)
        def _():
            dpk = j_dpos[J]
            LU, li, ui, nt = _lu_tile_blocked(sPanel[dpk], thresh)
            sPanel[dpk] = LU
            sCnt[...] = sCnt[...] + jnp.broadcast_to(nt, sCnt.shape)
            sLinv[bank] = li
            pltpu.make_async_copy(sLinv.at[bank], linv_out.at[j_step[J]],
                                  semW).start()

            # whole-L-part TRSM in wide chunks: ceil(nl/TC) dots of
            # (TC·bs, bs)x(bs, bs) instead of nl serial (bs, bs) dots.
            # Chunks may overshoot past nck into panel scratch rows
            # (the panel is allocated S+TC rows); overshoot rows hold
            # garbage that the store-back below never touches.
            def trsm(c, u):
                r0 = dpk + jnp.int32(1) + c * jnp.int32(TC)
                blk = sPanel[pl.ds(r0, TC)]
                R = dot(blk.reshape(TC * bs, bs), u)
                sPanel[pl.ds(r0, TC)] = R.reshape(TC, bs, bs)
                return u

            lax.fori_loop(0, j_tn[J], trsm, ui)

            pltpu.make_async_copy(sLinv.at[bank], linv_out.at[j_step[J]],
                                  semW).wait()
            sLinv[bank] = ui
            pltpu.make_async_copy(sLinv.at[bank], uinv_out.at[j_step[J]],
                                  semW).start()
            pltpu.make_async_copy(sLinv.at[bank], uinv_out.at[j_step[J]],
                                  semW).wait()

            def st(i, _):
                pltpu.make_async_copy(
                    sPanel.at[pl.ds(i * PC, PC)],
                    pool_out.at[pl.ds(base + i * PC, PC)], semP).start()
                return 0

            lax.fori_loop(0, nfull, st, 0)

            def st1(i, _):
                pltpu.make_async_copy(
                    sPanel.at[nfull * PC + i],
                    pool_out.at[base + nfull * PC + i], semP).start()
                return 0

            lax.fori_loop(0, nrem, st1, 0)

            def wtf2(i, _):
                pltpu.make_async_copy(
                    sPanel.at[pl.ds(i * PC, PC)],
                    pool_out.at[pl.ds(base + i * PC, PC)], semP).wait()
                return 0

            lax.fori_loop(0, nfull, wtf2, 0)

            def wt12(i, _):
                pltpu.make_async_copy(
                    sPanel.at[nfull * PC + i],
                    pool_out.at[base + nfull * PC + i], semP).wait()
                return 0

            lax.fori_loop(0, nrem, wt12, 0)

        @pl.when(J == nj - 1)
        def _():
            pltpu.make_async_copy(sCnt, tiny_out, semW).start()
            pltpu.make_async_copy(sCnt, tiny_out, semW).wait()

    return kern


@functools.lru_cache(maxsize=64)
def _clk_seg_call(nj, nbp, poolp, S, MC, bs, exact, interpret,
                  precision=None):
    """One segment's pallas_call (pool/linv/uinv alias through)."""
    kern = _clk_kernel(MC, S, exact, bs, precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=18,
        grid=(nj,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        scratch_shapes=[pltpu.VMEM((max(S + TC, PC), bs, bs), jnp.float32),
                        pltpu.VMEM((2, MC, bs, bs), jnp.float32),
                        pltpu.VMEM((2, bs, bs), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
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
            input_output_aliases={18: 0, 19: 1, 20: 2},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(tapes["j_start"], tapes["j_fin"], tapes["j_finB"],
          tapes["j_bpos"], tapes["j_step"], tapes["j_a0"], tapes["j_m"],
          tapes["j_col"], tapes["j_base"], tapes["j_ncol"],
          tapes["j_nfull"], tapes["j_nrem"],
          tapes["j_dpos"], tapes["j_tn"], tapes["j_sync"], tapes["j_c1"],
          tapes["dst"], consts, pool, linv, uinv)

    return seg


def build_factor_fn_clk(plan: SymbolicPlan, *, MC: int = 8,
                        exact: bool = True, interpret: bool = False,
                        precision: str | None = None):
    """Column-resident executor; same contract as flk/blocklu:
    factor(pool, thresh, tapes) -> (pool, linv, uinv, tiny).
    ``tapes`` is a tuple of per-segment tape dicts (one pallas_call per
    segment so the scalar-prefetch arrays fit SMEM at any problem size;
    pool and the inverse tables alias through the chain)."""
    assert plan.bs % 8 == 0
    tapes, consts = build_clk_tapes(plan, MC)
    nbp, poolp, S = consts["nbp"], consts["poolp"], consts["S"]
    segs = [_clk_seg_call(nj, nbp, poolp, S, MC, plan.bs, exact, interpret,
                          precision)
            for nj in consts["seg_nj"]]

    seg_fn = segs[0]

    def factor(pool, thresh, tapes):
        consts_a = jnp.reshape(lax.bitcast_convert_type(
            thresh.astype(jnp.float32), jnp.int32), (1,))
        linv = jnp.zeros((nbp + 1, plan.bs, plan.bs), pool.dtype)
        uinv = jnp.zeros((nbp + 1, plan.bs, plan.bs), pool.dtype)
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
