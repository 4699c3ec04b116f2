"""RDMA multi-chip factorization: one Pallas kernel per device.

The XLA distributed executor (dist2d.build_dist_factor_fn) is a per-level
program of gather/einsum/scatter ops with three psums per level — correct,
but op-dispatch-bound on real multi-chip hardware (the same ~15us/op cost
the single-chip work measured and escaped with fused kernels). This module
is the TPU-native analog of the reference's one-sided path: panel
broadcasts and diagonal-inverse broadcasts are *remote DMAs over ICI*
issued from inside a single fused kernel, with counted receive waits and a
per-level barrier instead of per-supernode tag bookkeeping.

Reference analogs:
- NVSHMEM put+signal trisolve comm: SRC/cuda/pdgstrs_lsum_cuda.cu:597-657
- C_Tree panel broadcasts: SRC/prec-independent/comm_tree.c:5-330
- U-diag/L-diag Isend: SRC/double/pdgstrf2.c:142-360

Design (per device, SPMD under shard_map over Mesh('r','c')):

  for level l (= one grid step of the kernel):
    A. owned diagonal steps: DMA block in, blocked LU + triangular
       inverses in VMEM, DMA the LU back and the inverses into the
       owner-local tables; PUT uinv to the pr-1 column peers and linv to
       the pc-1 row peers (into their level-position-indexed buffers).
       Wait own sends; wait counted receives (rcv_li/rcv_ui tapes).
    B. owned L panels: Y = L·uinv[pos]; DMA back; PUT Y to the pc-1 row
       peers' L buffers (L(i,k) is consumed by GEMMs on process row
       i mod pr only). U panels symmetric down the columns.
       Wait sends; wait counted receives (rcv_l/rcv_u).
    C. owned Schur GEMMs: read the replicated L/U buffer rows, update
       locally-owned target blocks (read-modify-write through VMEM).
    D. dissemination barrier (all peers) so nobody's level-(l+1) puts
       can land in buffers still being read at level l.

Every transferred block is (bs, bs), so counted waits are uniform
single-copy waits repeated N times; the receive counts per (device,
level) are host-precomputed into the rcv_* tapes.

Validated bit-for-bit against the XLA executor on the virtual CPU mesh
(interpret mode); on real multi-chip hardware the same program lowers the
puts onto ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.host.symbolic import SymbolicPlan
from .dist2d import DistPlan2D, _TRASH, _ZERO
from .grid import C_AXIS, R_AXIS, Grid2D


def build_rdma_recv_tapes(plan: SymbolicPlan, dplan: DistPlan2D):
    """Per-(device, level) receive counts for the counted waits.

    - rcv_ui: uinv blocks arriving from column-peer step owners
    - rcv_li: linv blocks arriving from row-peer step owners
    - rcv_l / rcv_u: panel blocks arriving from row / column peers
    """
    pr, pc, nlvl = dplan.pr, dplan.pc, dplan.nlvl
    step_level = np.asarray(plan.step_level)
    scol = np.asarray(plan.slot_col)
    srow = np.asarray(plan.slot_row)
    diag = np.asarray(plan.diag_slot)
    nb = plan.nb

    rcv_ui = np.zeros((pr, pc, nlvl), np.int64)
    rcv_li = np.zeros((pr, pc, nlvl), np.int64)
    rcv_l = np.zeros((pr, pc, nlvl), np.int64)
    rcv_u = np.zeros((pr, pc, nlvl), np.int64)

    for k in range(nb):
        l = step_level[k]
        rk, ck = k % pr, k % pc
        # uinv(k) -> (r, ck) for all r != rk ; linv(k) -> (rk, c) != ck
        for r in range(pr):
            if r != rk:
                rcv_ui[r, ck, l] += 1
        for c in range(pc):
            if c != ck:
                rcv_li[rk, c, l] += 1

    # L blocks (i, k): owner (i%pr, k%pc) puts to (i%pr, c!=k%pc)
    # U blocks (k, j): owner (k%pr, j%pc) puts to (r!=k%pr, j%pc)
    for k in range(nb):
        l = step_level[k]
        s0 = diag[k]
        # column k slots: U above diag, diag, L below (column-major pool)
        # L-part = slots with col k, row > k; U-part = row k, col > k
        # use plan tapes: l_slots/u_slots per step
        lo, hi = plan.l_ptr[k], plan.l_ptr[k + 1]
        for s in np.asarray(plan.l_slots[lo:hi]):
            i = srow[s]
            orow, ocol = i % pr, k % pc
            for c in range(pc):
                if c != ocol:
                    rcv_l[orow, c, l] += 1
        lo, hi = plan.u_ptr[k], plan.u_ptr[k + 1]
        for s in np.asarray(plan.u_slots[lo:hi]):
            j = scol[s]
            orow, ocol = k % pr, j % pc
            for r in range(pr):
                if r != orow:
                    rcv_u[r, ocol, l] += 1

    return dict(rcv_ui=jnp.asarray(rcv_ui, jnp.int32),
                rcv_li=jnp.asarray(rcv_li, jnp.int32),
                rcv_l=jnp.asarray(rcv_l, jnp.int32),
                rcv_u=jnp.asarray(rcv_u, jnp.int32))


def _rdma_kernel(pr, pc, bs, DL, LBUF, UBUF, dlen, interpret):
    from ..ops.kernels.flk import _lu_tile_blocked

    def dot(a, b):
        return jnp.dot(a, b, precision="highest",
                       preferred_element_type=jnp.float32)

    def kern(dptr, dstep, dloc, dpos, lptr, lloc, lpos, lpil,
             uptr, uloc, upos, upil, gptr, glpos, gupos, gtloc,
             rcv_li, rcv_ui, rcv_l, rcv_u, consts,
             pool_in,
             pool, linvL, uinvL, lC, uC, lB, uB, tiny_out,
             sT, sA, sB, sI, sCnt,
             semL, semSnd, semRcvI, semRcvP, semBar):
        del pool_in
        l = pl.program_id(0)
        nlvl = pl.num_programs(0)
        myr = lax.axis_index(R_AXIS)
        myc = lax.axis_index(C_AXIS)
        thresh = lax.bitcast_convert_type(
            jnp.full((1, 128), consts[0], jnp.int32), jnp.float32)[0, 0]

        @pl.when(l == 0)
        def _():
            sCnt[...] = jnp.zeros_like(sCnt)
            # zero the owner-local inverse tables: rows of non-owned steps
            # are never written, and the solve's masked padded reads must
            # see zeros, not uninitialized memory (the XLA executor
            # zero-initializes these the same way)
            sI[...] = jnp.zeros_like(sI)

            def z(i, _):
                cp1 = pltpu.make_async_copy(sI, linvL.at[i], semL)
                cp1.start()
                cp1.wait()
                cp2 = pltpu.make_async_copy(sI, uinvL.at[i], semL)
                cp2.start()
                cp2.wait()
                return 0

            lax.fori_loop(jnp.int32(0), jnp.int32(dlen + 1), z, 0, unroll=False)

        def wait_n(sem, n):
            def w(i, _):
                pltpu.make_async_copy(sT, sT, sem).wait()
                return 0
            lax.fori_loop(jnp.int32(0), jnp.asarray(n, jnp.int32), w, 0, unroll=False)

        # ---- A: owned diagonal steps ----
        def diag_step(t, _):
            cp = pltpu.make_async_copy(pool.at[dloc[t]], sT, semL)
            cp.start()
            cp.wait()
            LU, li, ui, nt = _lu_tile_blocked(sT[...], thresh)
            sCnt[...] = sCnt[...] + jnp.broadcast_to(nt, sCnt.shape)
            sT[...] = LU
            cp = pltpu.make_async_copy(sT, pool.at[dloc[t]], semL)
            cp.start()
            cp.wait()
            # linv -> local table + row peers' lC[pos]
            sI[...] = li
            cp = pltpu.make_async_copy(sI, linvL.at[t], semL)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(sI, lC.at[dpos[t]], semL)
            cp.start()
            cp.wait()

            def put_li(i, _):
                cc = lax.rem(myc + 1 + i, jnp.int32(pc))
                pltpu.make_async_remote_copy(
                    sI, lC.at[dpos[t]], semSnd, semRcvI,
                    device_id=(myr, cc),
                    device_id_type=pltpu.DeviceIdType.MESH).start()
                return 0

            lax.fori_loop(jnp.int32(0), jnp.int32(pc - 1), put_li, 0)
            wait_n(semSnd, pc - 1)
            # uinv -> local table + column peers' uC[pos]
            sI[...] = ui
            cp = pltpu.make_async_copy(sI, uinvL.at[t], semL)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(sI, uC.at[dpos[t]], semL)
            cp.start()
            cp.wait()

            def put_ui(i, _):
                rr = lax.rem(myr + 1 + i, jnp.int32(pr))
                pltpu.make_async_remote_copy(
                    sI, uC.at[dpos[t]], semSnd, semRcvI,
                    device_id=(rr, myc),
                    device_id_type=pltpu.DeviceIdType.MESH).start()
                return 0

            lax.fori_loop(jnp.int32(0), jnp.int32(pr - 1), put_ui, 0)
            wait_n(semSnd, pr - 1)
            return 0

        lax.fori_loop(dptr[l], dptr[l + 1], diag_step, 0, unroll=False)
        wait_n(semRcvI, rcv_li[l] + rcv_ui[l])

        # ---- B: owned panels (TRSM + broadcast) ----
        def l_panel(t, _):
            cp = pltpu.make_async_copy(pool.at[lloc[t]], sT, semL)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(uC.at[lpil[t]], sI, semL)
            cp.start()
            cp.wait()
            sT[...] = dot(sT[...], sI[...])
            cp = pltpu.make_async_copy(sT, pool.at[lloc[t]], semL)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(sT, lB.at[lpos[t]], semL)
            cp.start()
            cp.wait()

            def put(i, _):
                cc = lax.rem(myc + 1 + i, jnp.int32(pc))
                pltpu.make_async_remote_copy(
                    sT, lB.at[lpos[t]], semSnd, semRcvP,
                    device_id=(myr, cc),
                    device_id_type=pltpu.DeviceIdType.MESH).start()
                return 0

            lax.fori_loop(jnp.int32(0), jnp.int32(pc - 1), put, 0)
            wait_n(semSnd, pc - 1)
            return 0

        lax.fori_loop(lptr[l], lptr[l + 1], l_panel, 0, unroll=False)

        def u_panel(t, _):
            cp = pltpu.make_async_copy(pool.at[uloc[t]], sT, semL)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(lC.at[upil[t]], sI, semL)
            cp.start()
            cp.wait()
            sT[...] = dot(sI[...], sT[...])
            cp = pltpu.make_async_copy(sT, pool.at[uloc[t]], semL)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(sT, uB.at[upos[t]], semL)
            cp.start()
            cp.wait()

            def put(i, _):
                rr = lax.rem(myr + 1 + i, jnp.int32(pr))
                pltpu.make_async_remote_copy(
                    sT, uB.at[upos[t]], semSnd, semRcvP,
                    device_id=(rr, myc),
                    device_id_type=pltpu.DeviceIdType.MESH).start()
                return 0

            lax.fori_loop(jnp.int32(0), jnp.int32(pr - 1), put, 0)
            wait_n(semSnd, pr - 1)
            return 0

        lax.fori_loop(uptr[l], uptr[l + 1], u_panel, 0, unroll=False)
        wait_n(semRcvP, rcv_l[l] + rcv_u[l])

        # ---- C: owned Schur GEMMs (sequential read-modify-write) ----
        def gemm(t, _):
            cp = pltpu.make_async_copy(lB.at[glpos[t]], sA, semL)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(uB.at[gupos[t]], sB, semL)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(pool.at[gtloc[t]], sT, semL)
            cp.start()
            cp.wait()
            sT[...] = sT[...] - dot(sA[...], sB[...])
            cp = pltpu.make_async_copy(sT, pool.at[gtloc[t]], semL)
            cp.start()
            cp.wait()
            return 0

        lax.fori_loop(gptr[l], gptr[l + 1], gemm, 0, unroll=False)

        # ---- D: all-device barrier (buffer reuse fence) ----
        def bar_sig(i, _):
            d = lax.rem(myr * jnp.int32(pc) + myc + 1 + i,
                        jnp.int32(pr * pc))
            rr = lax.div(d, jnp.int32(pc))
            cc = lax.rem(d, jnp.int32(pc))
            pltpu.semaphore_signal(semBar, 1, device_id=(rr, cc),
                                   device_id_type=pltpu.DeviceIdType.MESH)
            return 0

        lax.fori_loop(jnp.int32(0), jnp.int32(pr * pc - 1), bar_sig, 0, unroll=False)
        pltpu.semaphore_wait(semBar, pr * pc - 1)

        @pl.when(l == nlvl - 1)
        def _():
            cp = pltpu.make_async_copy(sCnt, tiny_out, semL)
            cp.start()
            cp.wait()

    return kern


@functools.lru_cache(maxsize=16)
def _rdma_call(pr, pc, bs, DL, LBUF, UBUF, dlen, nlvl, n_local, dtype_name,
               interpret):
    dtype = jnp.dtype(dtype_name)
    kern = _rdma_kernel(pr, pc, bs, DL, LBUF, UBUF, dlen, interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=21,
        grid=(nlvl,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
        scratch_shapes=[pltpu.VMEM((bs, bs), jnp.float32),
                        pltpu.VMEM((bs, bs), jnp.float32),
                        pltpu.VMEM((bs, bs), jnp.float32),
                        pltpu.VMEM((bs, bs), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.REGULAR],
    )

    def call(scalars, pool):
        return pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((n_local, bs, bs), dtype),       # pool
                jax.ShapeDtypeStruct((dlen + 1, bs, bs), dtype),      # linvL
                jax.ShapeDtypeStruct((dlen + 1, bs, bs), dtype),      # uinvL
                jax.ShapeDtypeStruct((DL + 1, bs, bs), dtype),        # lC
                jax.ShapeDtypeStruct((DL + 1, bs, bs), dtype),        # uC
                jax.ShapeDtypeStruct((LBUF + 2, bs, bs), dtype),      # lB
                jax.ShapeDtypeStruct((UBUF + 2, bs, bs), dtype),      # uB
                jax.ShapeDtypeStruct((8, 128), jnp.float32),          # tiny
            ],
            grid_spec=grid_spec,
            input_output_aliases={21: 0},
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=3,
                allow_collective_id_without_custom_barrier=True),
            interpret=(pltpu.InterpretParams(dma_execution_mode="eager")
                       if interpret else False),
        )(*scalars, pool)

    return call


def build_dist_factor_fn_rdma(plan: SymbolicPlan, dplan: DistPlan2D,
                              grid: Grid2D, *, interpret: bool = False):
    """Same contract as dist2d.build_dist_factor_fn:
    factor(pools, thresh, tapes) -> (pools, linvL, uinvL, tiny), but the
    whole factorization is ONE fused kernel per device with RDMA panel /
    inverse broadcasts (puts over ICI on hardware)."""
    pr, pc, bs, nlvl = dplan.pr, dplan.pc, dplan.bs, dplan.nlvl
    DL, LBUF, UBUF = dplan.max_dlvl, dplan.max_lbuf, dplan.max_ubuf
    dlen = dplan.dstep.shape[-1]
    n_local = dplan.n_local
    mesh = grid.mesh
    rtapes = build_rdma_recv_tapes(plan, dplan)

    call = _rdma_call(pr, pc, bs, DL, LBUF, UBUF, dlen, nlvl, n_local,
                      "float32", interpret)

    tape_names = ["dptr", "dstep", "dloc", "dpos", "lptr", "lloc", "lpos",
                  "lpil", "uptr", "uloc", "upos", "upil", "gptr", "glpos",
                  "gupos", "gtloc"]

    def spmd(pools, thresh, *args):
        tapes = [a[0, 0] for a in args[:16]]
        rcvs = [a[0, 0] for a in args[16:20]]
        consts = jnp.reshape(lax.bitcast_convert_type(
            thresh.astype(jnp.float32), jnp.int32), (1,))
        outs = call(tuple(tapes) + tuple(rcvs) + (consts,), pools[0, 0])
        pool, linvL, uinvL = outs[0], outs[1], outs[2]
        tiny = outs[7][0, 0].astype(jnp.int32)
        tiny = lax.psum(lax.psum(tiny, R_AXIS), C_AXIS)
        return pool[None, None], linvL[None, None], uinvL[None, None], tiny

    sharded = P(R_AXIS, C_AXIS)
    rep = P()
    fn = shard_map(
        spmd, mesh=mesh,
        in_specs=(sharded, rep) + (sharded,) * 20,
        out_specs=(sharded, sharded, sharded, rep),
        check_vma=False)

    rcv_tuple = tuple(jnp.asarray(rtapes[n], jnp.int32)
                      for n in ("rcv_li", "rcv_ui", "rcv_l", "rcv_u"))

    @jax.jit
    def factor(pools, thresh, tapes):
        return fn(pools, thresh, *tapes, *rcv_tuple)

    return factor


# ---------------------------------------------------------------------------
# RDMA triangular solve: one fused kernel per device per sweep
# ---------------------------------------------------------------------------
#
# The collective solve (dist2d.build_dist_solve_fn) issues ~10 XLA ops and
# two psums per elimination level — op-dispatch-bound on hardware exactly
# like the factor was. This sweep runs as ONE Pallas kernel per device:
#
#   level l (one grid step):
#     1. zero my partial rows; owned GEMMs accumulate P[pos] -= L(I,J)·x_J
#        (all contributions to a row happen at the row's own level because
#        the schedule groups gemms by destination level)
#     2. PUT P[pos] to the row's diagonal owner — contributions to row I
#        only ever live in process row I%pr, so puts ride the mesh row —
#        into its (pos, my column) receive slot
#     3. counted wait; diagonal owners solve
#        x_I = inv(I) · (b_I + ΣP + Σslots) and PUT x_I to every peer
#        (X stays replicated, the pdReDistribute analog is the identity)
#     4. counted wait for this level's solved rows; dissemination barrier
#        (receive-slot reuse fence)
#
# This is the TPU recast of the reference's one-sided GPU trisolve
# (NVSHMEM put+signal, SRC/cuda/pdgstrs_lsum_cuda.cu:597-657) with the
# fmod/bmod counters replaced by per-level counted waits, and of the
# C_Tree x-vector broadcasts (SRC/prec-independent/comm_tree.c).


def build_rdma_solve_tapes(plan: SymbolicPlan, dplan: DistPlan2D,
                           which: str):
    """Per-device tapes for one RDMA solve sweep ("L" or "U").

    Returns (tapes, consts): tapes is a dict of (pr, pc, ...) int32
    arrays; consts has nlvl and MAXR (max rows per level, = receive-slot
    and partial-buffer height).
    """
    pr, pc, nb = dplan.pr, dplan.pc, dplan.nb
    owner_dev = np.asarray(dplan.owner_dev)
    local_slot = np.asarray(dplan.local_slot)
    dinv_idx = np.asarray(dplan.dinv_idx)
    ndev = pr * pc
    if which == "L":
        gptr_g, gslot_g = plan.lsol_gptr, plan.lsol_gslot
        gsrc_g, gdst_g = plan.lsol_gsrc, plan.lsol_gdst
        dptr_g, diag_g, nlvl = plan.lsol_dptr, plan.lsol_diag, plan.lsol_nlvl
    else:
        gptr_g, gslot_g = plan.usol_gptr, plan.usol_gslot
        gsrc_g, gdst_g = plan.usol_gsrc, plan.usol_gdst
        dptr_g, diag_g, nlvl = plan.usol_dptr, plan.usol_diag, plan.usol_nlvl

    pos_of_row = np.zeros(nb, dtype=np.int64)
    maxr = 1
    for l in range(nlvl):
        rows = np.asarray(diag_g[dptr_g[l]:dptr_g[l + 1]], np.int64)
        pos_of_row[rows] = np.arange(len(rows))
        maxr = max(maxr, len(rows))

    g_lists = [[[] for _ in range(nlvl)] for _ in range(ndev)]
    s_lists = [[[] for _ in range(nlvl)] for _ in range(ndev)]
    d_lists = [[[] for _ in range(nlvl)] for _ in range(ndev)]
    rcv_part = np.zeros((ndev, nlvl), np.int64)
    rcv_x = np.zeros((ndev, nlvl), np.int64)

    for l in range(nlvl):
        for t in range(gptr_g[l], gptr_g[l + 1]):
            s = int(gslot_g[t])
            g_lists[owner_dev[s]][l].append(
                (int(local_slot[s]), int(gsrc_g[t]),
                 int(pos_of_row[gdst_g[t]])))
        rows = np.asarray(diag_g[dptr_g[l]:dptr_g[l + 1]], np.int64)
        for I in rows:
            r_own, c_own = int(I % pr), int(I % pc)
            # every device in process row I%pr holds a (possibly zero)
            # partial for row I: zero it, and non-owners put it
            for c in range(pc):
                d = r_own * pc + c
                s_lists[d][l].append(
                    (int(pos_of_row[I]), c_own, 1 if c != c_own else 0))
            d_own = r_own * pc + c_own
            d_lists[d_own][l].append(
                (int(I), int(pos_of_row[I]), int(dinv_idx[I])))
            rcv_part[d_own, l] += pc - 1
            for d in range(ndev):
                if d != d_own:
                    rcv_x[d, l] += 1

    def pack(lists, nfields, fills):
        ptr = np.zeros((ndev, nlvl + 1), dtype=np.int64)
        for d in range(ndev):
            for l in range(nlvl):
                ptr[d, l + 1] = ptr[d, l] + len(lists[d][l])
        maxlen = max(1, int(ptr[:, -1].max()))
        out = [np.full((ndev, maxlen), fills[f], dtype=np.int32)
               for f in range(nfields)]
        for d in range(ndev):
            p0 = 0
            for l in range(nlvl):
                for item in lists[d][l]:
                    for f in range(nfields):
                        out[f][d, p0] = item[f]
                    p0 += 1
        return (ptr.reshape(pr, pc, nlvl + 1).astype(np.int32),
                [o.reshape(pr, pc, maxlen) for o in out])

    gp, (gloc, gsrc, gdpos) = pack(g_lists, 3, [_ZERO, nb, maxr])
    sp_, (spos, sdstc, ssend) = pack(s_lists, 3, [maxr, 0, 0])
    dp, (drow, dpos_a, dinv) = pack(d_lists, 3, [nb, maxr, 0])

    tapes = dict(gp=gp, gloc=gloc, gsrc=gsrc, gdpos=gdpos,
                 sp=sp_, spos=spos, sdstc=sdstc, ssend=ssend,
                 dp=dp, drow=drow, dpos=dpos_a, dinv=dinv,
                 rcv_part=rcv_part.reshape(pr, pc, nlvl).astype(np.int32),
                 rcv_x=rcv_x.reshape(pr, pc, nlvl).astype(np.int32))
    return tapes, dict(nlvl=nlvl, maxr=maxr)


def _rdma_solve_kernel(pr, pc, bs, R, MAXR, nb):

    def dot(a, b):
        return jnp.dot(a, b, precision="highest",
                       preferred_element_type=jnp.float32)

    def kern(gp, gloc, gsrc, gdpos, sp_, spos, sdstc, ssend,
             dp, drow, dpos, dinv, rcv_part, rcv_x,
             pool, dinvL, x_in,
             X, Pbuf, slots,
             sT, sA, sX, sI,
             semL, semSnd, semRcvP, semRcvX, semBar):
        del x_in
        l = pl.program_id(0)
        myr = lax.axis_index(R_AXIS)
        myc = lax.axis_index(C_AXIS)

        def wait_n(sem, n):
            def w(i, _):
                pltpu.make_async_copy(sT, sT, sem).wait()
                return 0
            lax.fori_loop(jnp.int32(0), jnp.asarray(n, jnp.int32), w, 0, unroll=False)

        # ---- 1. zero my partial rows, then owned GEMMs ----
        def zero(t, _):
            sX[...] = jnp.zeros_like(sX)
            cp = pltpu.make_async_copy(sX, Pbuf.at[spos[t]], semL)
            cp.start()
            cp.wait()
            return 0

        lax.fori_loop(sp_[l], sp_[l + 1], zero, 0, unroll=False)

        def gemm(t, _):
            cp = pltpu.make_async_copy(pool.at[gloc[t]], sA, semL)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(X.at[gsrc[t]], sX, semL)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(Pbuf.at[gdpos[t]], sT, semL)
            cp.start()
            cp.wait()
            sT[...] = sT[...] - dot(sA[...], sX[...])
            cp = pltpu.make_async_copy(sT, Pbuf.at[gdpos[t]], semL)
            cp.start()
            cp.wait()
            return 0

        lax.fori_loop(gp[l], gp[l + 1], gemm, 0, unroll=False)

        # ---- 2. put partials to the diagonal owner (mesh-row puts) ----
        def send(t, _):
            @pl.when(ssend[t] == 1)
            def _():
                cp = pltpu.make_async_copy(Pbuf.at[spos[t]], sX, semL)
                cp.start()
                cp.wait()
                pltpu.make_async_remote_copy(
                    sX, slots.at[spos[t] * pc + myc], semSnd, semRcvP,
                    device_id=(myr, sdstc[t]),
                    device_id_type=pltpu.DeviceIdType.MESH).start()
                pltpu.make_async_copy(sX, sX, semSnd).wait()
            return 0

        lax.fori_loop(sp_[l], sp_[l + 1], send, 0, unroll=False)
        wait_n(semRcvP, rcv_part[l])

        # ---- 3. diagonal solves + x broadcast ----
        def diag(t, _):
            cp = pltpu.make_async_copy(X.at[drow[t]], sT, semL)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(Pbuf.at[dpos[t]], sX, semL)
            cp.start()
            cp.wait()
            sT[...] = sT[...] + sX[...]

            def add_slot(c, _):
                @pl.when(c != myc)
                def _():
                    cp2 = pltpu.make_async_copy(
                        slots.at[dpos[t] * pc + c], sX, semL)
                    cp2.start()
                    cp2.wait()
                    sT[...] = sT[...] + sX[...]
                return 0

            lax.fori_loop(jnp.int32(0), jnp.int32(pc), add_slot, 0, unroll=False)
            cp = pltpu.make_async_copy(dinvL.at[dinv[t]], sI, semL)
            cp.start()
            cp.wait()
            sT[...] = dot(sI[...], sT[...])
            cp = pltpu.make_async_copy(sT, X.at[drow[t]], semL)
            cp.start()
            cp.wait()

            def put_x(i, _):
                d = lax.rem(myr * jnp.int32(pc) + myc + 1 + i,
                            jnp.int32(pr * pc))
                rr = lax.div(d, jnp.int32(pc))
                cc = lax.rem(d, jnp.int32(pc))
                pltpu.make_async_remote_copy(
                    sT, X.at[drow[t]], semSnd, semRcvX,
                    device_id=(rr, cc),
                    device_id_type=pltpu.DeviceIdType.MESH).start()
                return 0

            lax.fori_loop(jnp.int32(0), jnp.int32(pr * pc - 1), put_x, 0, unroll=False)
            wait_n(semSnd, pr * pc - 1)
            return 0

        lax.fori_loop(dp[l], dp[l + 1], diag, 0, unroll=False)
        wait_n(semRcvX, rcv_x[l])

        # ---- 4. dissemination barrier (slot-reuse fence) ----
        def bar_sig(i, _):
            d = lax.rem(myr * jnp.int32(pc) + myc + 1 + i,
                        jnp.int32(pr * pc))
            rr = lax.div(d, jnp.int32(pc))
            cc = lax.rem(d, jnp.int32(pc))
            pltpu.semaphore_signal(semBar, 1, device_id=(rr, cc),
                                   device_id_type=pltpu.DeviceIdType.MESH)
            return 0

        lax.fori_loop(jnp.int32(0), jnp.int32(pr * pc - 1), bar_sig, 0, unroll=False)
        pltpu.semaphore_wait(semBar, pr * pc - 1)

    return kern


@functools.lru_cache(maxsize=32)
def _rdma_solve_call(pr, pc, bs, R, MAXR, nlvl, n_local, dlen, nb,
                     collective_id, interpret):
    kern = _rdma_solve_kernel(pr, pc, bs, R, MAXR, nb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=14,
        grid=(nlvl,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        scratch_shapes=[pltpu.VMEM((bs, R), jnp.float32),
                        pltpu.VMEM((bs, bs), jnp.float32),
                        pltpu.VMEM((bs, R), jnp.float32),
                        pltpu.VMEM((bs, bs), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.REGULAR],
    )

    def call(scalars, pool, dinvL, x0):
        return pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((nb + 1, bs, R), jnp.float32),   # X
                jax.ShapeDtypeStruct((MAXR + 1, bs, R), jnp.float32),
                jax.ShapeDtypeStruct((MAXR * pc + 1, bs, R),
                                     jnp.float32),                    # slots
            ],
            grid_spec=grid_spec,
            input_output_aliases={16: 0},
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=collective_id,
                allow_collective_id_without_custom_barrier=True),
            interpret=(pltpu.InterpretParams(dma_execution_mode="eager")
                       if interpret else False),
        )(*scalars, pool, dinvL, x0)

    return call


_SOLVE_TAPE_ORDER = ["gp", "gloc", "gsrc", "gdpos", "sp", "spos", "sdstc",
                     "ssend", "dp", "drow", "dpos", "dinv", "rcv_part",
                     "rcv_x"]


def build_dist_solve_fn_rdma(plan: SymbolicPlan, dplan: DistPlan2D,
                             grid: Grid2D, nrhs: int, *,
                             interpret: bool = False):
    """Same contract as dist2d.build_dist_solve_fn:
    solve(pools, linvL, uinvL, stapes, b) -> x, but each sweep is ONE
    fused kernel per device with remote-DMA partial-sum reduction and
    x-row broadcasts (ICI puts on hardware). ``stapes`` is ignored —
    the RDMA tapes are baked in (device-resident, mesh-sharded)."""
    pr, pc, bs, nb = dplan.pr, dplan.pc, dplan.bs, dplan.nb
    mesh = grid.mesh
    # lane-pad the RHS block width: Mosaic DMAs want 128-lane rows on
    # hardware; the interpreter accepts 8
    lane = 8 if interpret else 128
    R = max(lane, ((nrhs + lane - 1) // lane) * lane)
    dlen = dplan.dstep.shape[-1]

    ltapes, lc = build_rdma_solve_tapes(plan, dplan, "L")
    utapes, uc = build_rdma_solve_tapes(plan, dplan, "U")
    lcall = _rdma_solve_call(pr, pc, bs, R, lc["maxr"], lc["nlvl"],
                             dplan.n_local, dlen, nb, 4, interpret)
    ucall = _rdma_solve_call(pr, pc, bs, R, uc["maxr"], uc["nlvl"],
                             dplan.n_local, dlen, nb, 5, interpret)

    lt = tuple(jnp.asarray(ltapes[n], jnp.int32) for n in _SOLVE_TAPE_ORDER)
    ut = tuple(jnp.asarray(utapes[n], jnp.int32) for n in _SOLVE_TAPE_ORDER)
    nl, nu = len(lt), len(ut)

    def spmd(pools, linvL, uinvL, b, *args):
        ltapes_d = [a[0, 0] for a in args[:nl]]
        utapes_d = [a[0, 0] for a in args[nl:nl + nu]]
        pool = pools[0, 0]
        linv = linvL[0, 0]
        uinv = uinvL[0, 0]
        X = b.reshape(nb, bs, nrhs)
        X0 = jnp.zeros((nb + 1, bs, R), jnp.float32)
        X0 = X0.at[:nb, :, :nrhs].set(X.astype(jnp.float32))
        X1, _, _ = lcall(tuple(ltapes_d), pool, linv, X0)
        X2, _, _ = ucall(tuple(utapes_d), pool, uinv, X1)
        return X2[:nb, :, :nrhs].reshape(nb * bs, nrhs)

    sharded = P(R_AXIS, C_AXIS)
    rep = P()
    fn = shard_map(spmd, mesh=mesh,
                   in_specs=(sharded, sharded, sharded, rep)
                   + (sharded,) * (nl + nu),
                   out_specs=rep, check_vma=False)

    @jax.jit
    def solve(pools, linvL, uinvL, stapes, b):
        del stapes
        out = fn(pools, linvL, uinvL, jnp.asarray(b, jnp.float32), *lt, *ut)
        return out.astype(b.dtype)

    return solve
