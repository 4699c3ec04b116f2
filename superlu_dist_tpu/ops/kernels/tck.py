"""Tiled column-resident left-looking factorization kernel (tck).

Generalizes clk.py to columns of ANY height: the resident panel becomes a
sliding TILE of W block rows over the column, so the kernel no longer
needs the whole column in VMEM (clk's PANEL_CAP≈104 blocks forced n≥1e5
matrices onto the per-op-bound flk kernel).

Left-looking invariants that make the tiling sound (sup-col update, the
same math as the reference's pdgstrf right-looking pipeline,
SRC/double/pdgstrf.c:243-2003, reached from the left-looking side):

- column k's slots are contiguous and position-sorted by row
  (U-part ascending, diag, L-part ascending; symbolic._renumber_column_major);
- contributions into position p come only from source columns j with
  pos(j) < p, so processing sources in ascending j within a tile means an
  in-tile B block U(j,k) has already received all ITS contributions when
  first used, and can be finalized in place (linv(j)·U(j,k)) — exactly
  clk's finB;
- a source's first contribution tile is never earlier than its own tile
  (its targets are rows > j), so a B read from the POOL (source in an
  earlier tile) is always already finalized and stored;
- U positions whose source never contributes inside their own tile get an
  explicit finalize job in the tile sweep; the diagonal runs the in-kernel
  blocked LU; L positions TRSM against uinv(k), which stays in VMEM
  scratch across the column's later tiles.

Job stream per tile: LOAD → pair-GEMM chunks (ascending source; one
A-range DMA + one (MC·B, B)×(B, B) matmul per chunk) → sweep (FINU /
DIAG / TRSM jobs in ascending position) → STORE. One pallas_call runs the
whole factorization (segmented like clk when the tape exceeds SMEM).
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

W = 64          # tile rows (blocks); sTile = (W + TC + 1, bs, bs) VMEM
MC = 8          # A-range chunk rows per GEMM job
PC = 8          # tile load/store chunk (blocks per range DMA)
TC = 8          # TRSM chunk width
SEG_JOBS = 6000  # jobs per pallas_call segment (SMEM tape budget)

# job types
J_GEMM = 0
J_FINU = 1
J_DIAG = 2
J_TRSM = 3
J_LOAD = 4
J_STORE = 5
J_NOP = 6


def build_tck_tapes(plan: SymbolicPlan, w: int = W, mc: int = MC):
    nb = plan.nb
    scol = np.asarray(plan.slot_col)
    srow = np.asarray(plan.slot_row)
    assert np.all(np.diff(scol) >= 0), "tck requires column-major slots"
    colptr = np.searchsorted(scol, np.arange(nb + 1))
    ncol = np.diff(colptr)
    diag_slot = np.asarray(plan.diag_slot)
    dpos = diag_slot - colptr[:nb]
    poolp = _bl.factor_buckets(plan).poolp
    trash = w + TC                    # sTile trash row index

    F = ["jt", "a0", "m", "bslot", "bpos", "jrow", "p", "b0", "nfull",
         "nrem", "sync"]
    jobs = {f: [] for f in F}
    dst_list = []
    nj = 0

    def emit(jt, a0=0, m=0, bslot=0, bpos=0, jrow=0, p=0, b0=0,
             nfull=0, nrem=0, dst=None, sync=1):
        nonlocal nj
        jobs["jt"].append(jt)
        jobs["a0"].append(a0)
        jobs["m"].append(m)
        jobs["bslot"].append(bslot)
        jobs["bpos"].append(bpos)
        jobs["jrow"].append(jrow)
        jobs["p"].append(p)
        jobs["b0"].append(b0)
        jobs["nfull"].append(nfull)
        jobs["nrem"].append(nrem)
        jobs["sync"].append(sync)
        dst_list.append(np.full(mc, trash, np.int32) if dst is None else dst)
        nj += 1

    col_starts = []
    for k in range(nb):
        base = int(colptr[k])
        nck = int(ncol[k])
        dpk = int(dpos[k])
        rows_k = srow[base:base + nck]
        col_starts.append(nj)
        # source prep: for each U position t (source j = its row), the
        # L-part range of column j, its target positions in column k
        # (computed once per source, not per tile), and whether it
        # finalizes in place
        srcs = []
        for t in range(dpk):
            j = int(rows_k[t])
            la0 = int(diag_slot[j]) + 1
            lm = int(colptr[j + 1]) - la0
            pos_j = None
            if lm:
                rows_j = srow[la0:la0 + lm]
                pos_j = np.searchsorted(rows_k, rows_j)
                ok = (pos_j < nck) & (rows_k[np.minimum(pos_j, nck - 1)]
                                      == rows_j)
                if not np.all(ok):
                    raise ValueError("fill closure violated — tck needs "
                                     "exact-LU symbolic")
            srcs.append((t, j, la0, lm, pos_j))
        fin_inplace = np.zeros(dpk, dtype=bool)

        for t0 in range(0, nck, w):
            t1 = min(t0 + w, nck)
            tl = t1 - t0
            emit(J_LOAD, b0=base + t0, nfull=tl // PC, nrem=tl - PC * (tl // PC))
            # ---- pair-GEMM chunks, ascending source ----
            for (t, j, la0, lm, pos_j) in srcs:
                if lm == 0:
                    continue
                # positions are sorted: the tile's run is contiguous
                lo = int(np.searchsorted(pos_j, t0))
                hi = int(np.searchsorted(pos_j, t1))
                if lo == hi:
                    continue
                in_tile = t0 <= t < t1
                first = True
                for c0 in range(lo, hi, mc):
                    m = min(mc, hi - c0)
                    a0 = la0 + c0
                    shift = 0
                    if a0 + mc > poolp:
                        shift = a0 + mc - poolp
                        a0 -= shift
                    d = np.full(mc, trash, np.int32)
                    d[shift:shift + m] = pos_j[c0:c0 + m] - t0
                    finB = 0
                    bslot = 0
                    bp = trash
                    if in_tile:
                        bp = t - t0
                        if first and not fin_inplace[t]:
                            finB = 1
                            fin_inplace[t] = True
                    else:
                        bslot = base + t   # finalized in an earlier tile
                    emit(J_GEMM, a0=a0, m=m, bslot=bslot,
                         bpos=(bp if in_tile else trash),
                         jrow=j, p=finB,
                         b0=1 if (first and not in_tile) else 0,
                         dst=d, sync=1)
                    first = False
            # ---- sweep: FINU / DIAG / TRSM, ascending position ----
            for p in range(t0, min(t1, dpk)):
                if not fin_inplace[p]:
                    emit(J_FINU, jrow=int(rows_k[p]), p=p - t0)
                    fin_inplace[p] = True
            if t0 <= dpk < t1:
                emit(J_DIAG, jrow=k, p=dpk - t0)
            l_lo = max(t0, dpk + 1)
            if l_lo < t1:
                for c0 in range(l_lo, t1, TC):
                    emit(J_TRSM, p=c0 - t0, m=min(TC, t1 - c0))
            emit(J_STORE, b0=base + t0, nfull=tl // PC,
                 nrem=tl - PC * (tl // PC))

    arr = {f: np.asarray(v, dtype=np.int32) for f, v in jobs.items()}
    dst = (np.concatenate(dst_list) if dst_list
           else np.empty(0, np.int32))
    nbp = _bl.bucket125(nb)

    # segment at column boundaries (SMEM tape budget), uniform size
    cuts = [0]
    for j0 in col_starts:
        if j0 - cuts[-1] >= SEG_JOBS:
            cuts.append(int(j0))
    cuts.append(nj)
    uni = _bl.bucket125(max(hi - lo for lo, hi in
                            zip(cuts[:-1], cuts[1:])), lo=128)

    def pack(lo, hi):
        pad = uni - (hi - lo)

        def p(a, fill=0, wd=1):
            a = a[lo * wd: hi * wd]
            if not pad:
                return jnp.asarray(a)
            return jnp.asarray(np.concatenate(
                [a, np.full(pad * wd, fill, a.dtype)]))

        return dict(
            jt=p(arr["jt"], J_NOP), a0=p(arr["a0"]), m=p(arr["m"]),
            bslot=p(arr["bslot"]), bpos=p(arr["bpos"], trash),
            jrow=p(arr["jrow"], nbp), p=p(arr["p"]), b0=p(arr["b0"]),
            nfull=p(arr["nfull"]), nrem=p(arr["nrem"]),
            dst=p(dst, trash, wd=mc),
        )

    tapes = tuple(pack(lo, hi) for lo, hi in zip(cuts[:-1], cuts[1:]))
    consts = dict(nbp=nbp, poolp=poolp, w=w,
                  seg_nj=tuple(len(t["jt"]) for t in tapes),
                  njobs=nj)
    return tapes, consts


def _tck_kernel(mc, w, exact, bs, precision=None):
    # Schur-GEMM pass precision (see clk._clk_kernel): "high" = 3
    # bf16 passes; diagonal LU stays "highest" inside _lu_tile_blocked
    prec = _bl.resolve_gemm_precision(exact, precision)
    trash = w + TC

    def dot(a, b):
        return jnp.dot(a, b, precision=prec,
                       preferred_element_type=jnp.float32)

    def kern(jt, a0, m, bslot, bpos, jrow, p, b0, nfull, nrem, dst,
             consts_ref,
             pool_ref, linv_ref, uinv_ref,
             pool_out, linv_out, uinv_out, tiny_out,
             sTile, sL, sB, sI, sUk, sCnt,
             semT, semA, semB, semI, semW):
        del pool_ref, linv_ref, uinv_ref
        thresh = lax.bitcast_convert_type(
            jnp.full((1, 128), consts_ref[0], jnp.int32),
            jnp.float32)[0, 0]
        J = pl.program_id(0)
        t = jt[J]

        @pl.when(J == 0)
        def _():
            sCnt[...] = jnp.zeros_like(sCnt)

        # ---- LOAD: tile rows into sTile (exact range chunks) ----
        @pl.when(t == J_LOAD)
        def _():
            nf, nr, bb = nfull[J], nrem[J], b0[J]

            def ld(i, _):
                pltpu.make_async_copy(
                    pool_out.at[pl.ds(bb + i * PC, PC)],
                    sTile.at[pl.ds(i * PC, PC)], semT).start()
                return 0

            lax.fori_loop(0, nf, ld, 0)

            def ld1(i, _):
                pltpu.make_async_copy(
                    pool_out.at[bb + nf * PC + i],
                    sTile.at[nf * PC + i], semT).start()
                return 0

            lax.fori_loop(0, nr, ld1, 0)

            def wt(i, _):
                pltpu.make_async_copy(
                    pool_out.at[pl.ds(bb + i * PC, PC)],
                    sTile.at[pl.ds(i * PC, PC)], semT).wait()
                return 0

            lax.fori_loop(0, nf, wt, 0)

            def wt1(i, _):
                pltpu.make_async_copy(
                    pool_out.at[bb + nf * PC + i],
                    sTile.at[nf * PC + i], semT).wait()
                return 0

            lax.fori_loop(0, nr, wt1, 0)

        # ---- GEMM chunk: A-range × B → scatter into tile ----
        @pl.when(t == J_GEMM)
        def _():
            cp = pltpu.make_async_copy(
                pool_out.at[pl.ds(a0[J], mc)], sL, semA)
            cp.start()

            # B operand: in-tile (bpos < trash) or from pool (bslot)
            @pl.when((bpos[J] == trash) & (b0[J] == 1))
            def _():
                cpb = pltpu.make_async_copy(
                    pool_out.at[bslot[J]], sB, semB)
                cpb.start()
                cpb.wait()

            # finB: finalize the in-tile B in place on first use
            @pl.when(p[J] == 1)
            def _():
                cpi = pltpu.make_async_copy(
                    linv_out.at[jrow[J]], sI, semI)
                cpi.start()
                cpi.wait()
                sTile[bpos[J]] = dot(sI[...], sTile[bpos[J]])

            cp.wait()
            Bv = lax.cond(bpos[J] == trash, lambda: sB[...],
                          lambda: sTile[bpos[J]])
            R = dot(sL[...].reshape(mc * bs, bs), Bv)
            doff = J * jnp.int32(mc)
            for r in range(mc):
                dd = dst[doff + r]
                sTile[dd] = sTile[dd] - R[r * bs:(r + 1) * bs]

        # ---- FINU: U(j,k) ← linv(j)·U(j,k) ----
        @pl.when(t == J_FINU)
        def _():
            cpi = pltpu.make_async_copy(linv_out.at[jrow[J]], sI, semI)
            cpi.start()
            cpi.wait()
            sTile[p[J]] = dot(sI[...], sTile[p[J]])

        # ---- DIAG: blocked LU + inverses; keep uinv resident ----
        @pl.when(t == J_DIAG)
        def _():
            LU, li, ui, nt = _lu_tile_blocked(sTile[p[J]], thresh)
            sTile[p[J]] = LU
            sCnt[...] = sCnt[...] + jnp.broadcast_to(nt, sCnt.shape)
            sI[...] = li
            cp = pltpu.make_async_copy(sI, linv_out.at[jrow[J]], semW)
            cp.start()
            cp.wait()
            sUk[...] = ui
            sI[...] = ui
            cp = pltpu.make_async_copy(sI, uinv_out.at[jrow[J]], semW)
            cp.start()
            cp.wait()

        # ---- TRSM chunk: L rows × uinv(k) ----
        @pl.when(t == J_TRSM)
        def _():
            r0 = p[J]
            blk = sTile[pl.ds(r0, TC)]
            R = dot(blk.reshape(TC * bs, bs), sUk[...])
            sTile[pl.ds(r0, TC)] = R.reshape(TC, bs, bs)

        # ---- STORE: tile back to the pool ----
        @pl.when(t == J_STORE)
        def _():
            nf, nr, bb = nfull[J], nrem[J], b0[J]

            def st(i, _):
                pltpu.make_async_copy(
                    sTile.at[pl.ds(i * PC, PC)],
                    pool_out.at[pl.ds(bb + i * PC, PC)], semT).start()
                return 0

            lax.fori_loop(0, nf, st, 0)

            def st1(i, _):
                pltpu.make_async_copy(
                    sTile.at[nf * PC + i],
                    pool_out.at[bb + nf * PC + i], semT).start()
                return 0

            lax.fori_loop(0, nr, st1, 0)

            def wt(i, _):
                pltpu.make_async_copy(
                    sTile.at[pl.ds(i * PC, PC)],
                    pool_out.at[pl.ds(bb + i * PC, PC)], semT).wait()
                return 0

            lax.fori_loop(0, nf, wt, 0)

            def wt1(i, _):
                pltpu.make_async_copy(
                    sTile.at[nf * PC + i],
                    pool_out.at[bb + nf * PC + i], semT).wait()
                return 0

            lax.fori_loop(0, nr, wt1, 0)

        @pl.when(J == pl.num_programs(0) - 1)
        def _():
            cp = pltpu.make_async_copy(sCnt, tiny_out, semW)
            cp.start()
            cp.wait()

    return kern


@functools.lru_cache(maxsize=64)
def _tck_seg_call(nj, nbp, poolp, w, mc, bs, exact, interpret,
                  precision=None):
    kern = _tck_kernel(mc, w, exact, bs, precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=12,
        grid=(nj,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        scratch_shapes=[pltpu.VMEM((w + TC + 1, bs, bs), jnp.float32),
                        pltpu.VMEM((mc, bs, bs), jnp.float32),
                        pltpu.VMEM((bs, bs), jnp.float32),
                        pltpu.VMEM((bs, bs), jnp.float32),
                        pltpu.VMEM((bs, bs), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
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
            input_output_aliases={12: 0, 13: 1, 14: 2},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(tapes["jt"], tapes["a0"], tapes["m"], tapes["bslot"],
          tapes["bpos"], tapes["jrow"], tapes["p"], tapes["b0"],
          tapes["nfull"], tapes["nrem"], tapes["dst"],
          consts, pool, linv, uinv)

    return seg


def build_factor_fn_tck(plan: SymbolicPlan, *, w: int = W, mc: int = MC,
                        exact: bool = True, interpret: bool = False,
                        precision: str | None = None):
    """Tiled column executor; same contract as clk/flk/blocklu:
    factor(pool, thresh, tapes) -> (pool, linv, uinv, tiny)."""
    assert plan.bs % 8 == 0
    tapes, consts = build_tck_tapes(plan, w, mc)
    nbp, poolp = consts["nbp"], consts["poolp"]
    seg_fn = _tck_seg_call(consts["seg_nj"][0], nbp, poolp, w, mc,
                           plan.bs, exact, interpret, precision)

    def factor(pool, thresh, tapes):
        consts_a = jnp.reshape(lax.bitcast_convert_type(
            thresh.astype(jnp.float32), jnp.int32), (1,))
        linv = jnp.zeros((nbp + 1, plan.bs, plan.bs), pool.dtype)
        uinv = jnp.zeros((nbp + 1, plan.bs, plan.bs), pool.dtype)
        tiny = jnp.zeros((), jnp.int32)
        if len(tapes) == 1:
            pool, linv, uinv, tq = seg_fn(consts_a, pool, linv, uinv,
                                          tapes[0])
            return pool, linv, uinv, tq[0, 0].astype(jnp.int32)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *tapes)

        def body(carry, tp):
            pool, linv, uinv, tiny = carry
            p2, l2, u2, tq = seg_fn(consts_a, pool, linv, uinv, tp)
            return (p2, l2, u2, tiny + tq[0, 0].astype(jnp.int32)), None

        (pool, linv, uinv, tiny), _ = lax.scan(
            body, (pool, linv, uinv, tiny), stacked)
        return pool, linv, uinv, tiny

    return jax.jit(factor, donate_argnums=(0,)), tapes
