"""2D block-cyclic distributed factorization + solve over a device mesh.

TPU-native analog of the reference's 2D algorithm:

- block (I,J) → device (I mod Pr, J mod Pc), exactly the reference's
  block-cyclic layout (superlu_defs.h:380-397);
- elimination is *level-batched*: all independent block columns at one
  elimination-tree level factor together (the static replacement for the
  look-ahead pipeline of pdgstrf.c:1110-1300), so the mesh exchanges three
  psums per level instead of per step;
- the per-supernode L-panel broadcast down the process row and U-panel
  broadcast down the process column (the C_Tree bcasts of pddistribute.c /
  the Isend/Irecv pipeline of pdgstrf.c) become masked psums over the 'c'
  and 'r' mesh axes: owners contribute their post-TRSM panel blocks into a
  fixed-size buffer, the psum replicates them across the axis, and every
  device GEMMs from the replicated buffer into its locally-owned targets;
- diagonal blocks are factored by their owners only; the per-level
  triangular inverses are psum-broadcast into replicated linv/uinv arrays
  (the U-diag Isend of pdgstrf2.c:142-360 → one fused collective);
- the distributed triangular solves keep X replicated and psum per-level
  partial sums (replacing the fmod/bmod message-driven loops and
  LBtree/LRtree collectives of pdgstrs.c / pdgstrs_lsum.c).

Per-device work lists are precomputed on the host from the SymbolicPlan
(the distribution phase — pddistribute.c analog) and shipped as
mesh-sharded instruction tapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.host.symbolic import SymbolicPlan
from ..ops.kernels.blocklu import MATMUL_PRECISION, block_lu_inv
from .grid import C_AXIS, R_AXIS, Grid2D

# local pool layout: slot 0 = zero block (never written), slot 1 = trash
_ZERO = 0
_TRASH = 1
_NLOCAL_RESERVED = 2


@dataclasses.dataclass
class DistPlan2D:
    """Per-device instruction tapes, stacked over the (Pr, Pc) grid and
    grouped by elimination level."""

    pr: int
    pc: int
    nb: int
    bs: int
    nlvl: int
    n_local: int          # local pool slots (incl. zero/trash)
    max_lbuf: int         # L broadcast buffer rows per level
    max_ubuf: int

    # value placement: global slot -> (device, local slot)
    owner_dev: np.ndarray     # (nslots,) linear device id r*pc + c
    local_slot: np.ndarray    # (nslots,)

    # factor tapes, all leading dims (pr, pc, ...)
    dptr: np.ndarray          # (pr, pc, nlvl+1) owned diag ranges
    dstep: np.ndarray         # step ids of owned diag blocks
    dloc: np.ndarray          # local slots of owned diag blocks
    lptr: np.ndarray          # (pr, pc, nlvl+1)
    lloc: np.ndarray          # owned L-panel local slots
    lpos: np.ndarray          # fill position in the level's L buffer
    lstep: np.ndarray         # owning elimination step
    uptr: np.ndarray
    uloc: np.ndarray
    upos: np.ndarray
    ustep: np.ndarray
    gptr: np.ndarray
    glpos: np.ndarray
    gupos: np.ndarray
    gtloc: np.ndarray

    # solve tapes (L then U), per device, grouped by level
    lsol_gptr: np.ndarray
    lsol_gloc: np.ndarray
    lsol_gsrc: np.ndarray
    lsol_gdst: np.ndarray
    usol_gptr: np.ndarray
    usol_gloc: np.ndarray
    usol_gsrc: np.ndarray
    usol_gdst: np.ndarray


def partition_plan(plan: SymbolicPlan, pr: int, pc: int) -> DistPlan2D:
    """Distribute the symbolic plan block-cyclically over a Pr×Pc grid
    (the pddistribute analog: builds every device's local work lists)."""
    nb = plan.nb
    nlvl = plan.n_flevels
    ndev = pr * pc
    srow, scol = plan.slot_row, plan.slot_col
    owner_dev = (srow % pr) * pc + (scol % pc)

    # local slot numbering per device (stable by global slot id)
    local_slot = np.zeros(plan.nslots, dtype=np.int64)
    counts = np.full(ndev, _NLOCAL_RESERVED, dtype=np.int64)
    order = np.argsort(owner_dev, kind="stable")
    for s in order:
        d = owner_dev[s]
        local_slot[s] = counts[d]
        counts[d] += 1
    n_local = int(counts.max())

    lev = plan.step_level
    steps_by_level = [np.flatnonzero(lev == l) for l in range(nlvl)]

    d_lists = [[[] for _ in range(nlvl)] for _ in range(ndev)]
    l_lists = [[[] for _ in range(nlvl)] for _ in range(ndev)]
    u_lists = [[[] for _ in range(nlvl)] for _ in range(ndev)]
    g_lists = [[[] for _ in range(nlvl)] for _ in range(ndev)]

    max_lbuf = 1
    max_ubuf = 1
    for l in range(nlvl):
        # buffer positions for this level: all L blocks of all steps at the
        # level, ordered (step, I) within each mesh row; same for U per col.
        lrow_count = np.zeros(pr, dtype=np.int64)
        ucol_count = np.zeros(pc, dtype=np.int64)
        lpos_of: dict[int, int] = {}
        upos_of: dict[int, int] = {}
        for k in steps_by_level[l]:
            ds = plan.diag_slot[k]
            d = owner_dev[ds]
            d_lists[d][l].append((int(k), int(local_slot[ds])))

            lo, hi = plan.l_ptr[k], plan.l_ptr[k + 1]
            for s in plan.l_slots[lo:hi]:
                r = int(srow[s] % pr)
                pos = int(lrow_count[r])
                lrow_count[r] += 1
                lpos_of[int(s)] = pos
                l_lists[owner_dev[s]][l].append(
                    (int(local_slot[s]), pos, int(k)))
            uo, uh = plan.u_ptr[k], plan.u_ptr[k + 1]
            for s in plan.u_slots[uo:uh]:
                c = int(scol[s] % pc)
                pos = int(ucol_count[c])
                ucol_count[c] += 1
                upos_of[int(s)] = pos
                u_lists[owner_dev[s]][l].append(
                    (int(local_slot[s]), pos, int(k)))
        max_lbuf = max(max_lbuf, int(lrow_count.max()))
        max_ubuf = max(max_ubuf, int(ucol_count.max()))
        for k in steps_by_level[l]:
            go, gh = plan.g_ptr[k], plan.g_ptr[k + 1]
            for t in range(go, gh):
                tgt = plan.g_t[t]
                g_lists[owner_dev[tgt]][l].append(
                    (lpos_of[int(plan.g_l[t])], upos_of[int(plan.g_u[t])],
                     int(local_slot[tgt])))

    def pack(lists, nfields, fills=None):
        ptr = np.zeros((ndev, nlvl + 1), dtype=np.int64)
        for d in range(ndev):
            for l in range(nlvl):
                ptr[d, l + 1] = ptr[d, l] + len(lists[d][l])
        maxlen = max(1, int(ptr[:, -1].max()))
        fills = fills or [0] * nfields
        out = [np.full((ndev, maxlen), fills[f], dtype=np.int32)
               for f in range(nfields)]
        for d in range(ndev):
            pos = 0
            for l in range(nlvl):
                for item in lists[d][l]:
                    for f in range(nfields):
                        out[f][d, pos] = item[f]
                    pos += 1
        return (ptr.reshape(pr, pc, nlvl + 1).astype(np.int32),
                [o.reshape(pr, pc, maxlen) for o in out])

    dptr, (dstep, dloc) = pack(d_lists, 2, fills=[nb, _TRASH])
    lptr, (lloc, lpos, lstep) = pack(l_lists, 3, fills=[_TRASH, 0, nb])
    uptr, (uloc, upos, ustep) = pack(u_lists, 3, fills=[_TRASH, 0, nb])
    gptr, (glpos, gupos, gtloc) = pack(g_lists, 3)

    # ---------- solve tapes: group each sweep's gemms by (device, level) ----
    def solve_pack(gptr_g, gslot_g, gsrc_g, gdst_g, snlvl):
        lists = [[[] for _ in range(snlvl)] for _ in range(ndev)]
        for l in range(snlvl):
            for t in range(gptr_g[l], gptr_g[l + 1]):
                s = gslot_g[t]
                lists[owner_dev[s]][l].append(
                    (int(local_slot[s]), int(gsrc_g[t]), int(gdst_g[t])))
        ptr = np.zeros((ndev, snlvl + 1), dtype=np.int64)
        for d in range(ndev):
            for l in range(snlvl):
                ptr[d, l + 1] = ptr[d, l] + len(lists[d][l])
        maxlen = max(1, int(ptr[:, -1].max()))
        loc = np.full((ndev, maxlen), _ZERO, dtype=np.int32)
        src = np.zeros((ndev, maxlen), dtype=np.int32)
        dst = np.full((ndev, maxlen), nb, dtype=np.int32)
        for d in range(ndev):
            pos = 0
            for l in range(snlvl):
                for (a, b, c) in lists[d][l]:
                    loc[d, pos] = a
                    src[d, pos] = b
                    dst[d, pos] = c
                    pos += 1
        return (ptr.reshape(pr, pc, snlvl + 1).astype(np.int32),
                loc.reshape(pr, pc, maxlen), src.reshape(pr, pc, maxlen),
                dst.reshape(pr, pc, maxlen))

    lsg = solve_pack(plan.lsol_gptr, plan.lsol_gslot, plan.lsol_gsrc,
                     plan.lsol_gdst, plan.lsol_nlvl)
    usg = solve_pack(plan.usol_gptr, plan.usol_gslot, plan.usol_gsrc,
                     plan.usol_gdst, plan.usol_nlvl)

    return DistPlan2D(
        pr=pr, pc=pc, nb=nb, bs=plan.bs, nlvl=nlvl, n_local=n_local,
        max_lbuf=max_lbuf, max_ubuf=max_ubuf,
        owner_dev=owner_dev, local_slot=local_slot,
        dptr=dptr, dstep=dstep, dloc=dloc,
        lptr=lptr, lloc=lloc, lpos=lpos, lstep=lstep,
        uptr=uptr, uloc=uloc, upos=upos, ustep=ustep,
        gptr=gptr, glpos=glpos, gupos=gupos, gtloc=gtloc,
        lsol_gptr=lsg[0], lsol_gloc=lsg[1], lsol_gsrc=lsg[2],
        lsol_gdst=lsg[3],
        usol_gptr=usg[0], usol_gloc=usg[1], usol_gsrc=usg[2],
        usol_gdst=usg[3],
    )


def init_local_pools(plan: SymbolicPlan, dplan: DistPlan2D, A3, dtype,
                     grid: Grid2D) -> jax.Array:
    """Build the distributed block pool as a mesh-sharded array
    ((pr, pc, n_local, B, B), sharded over ('r','c'))."""
    import scipy.sparse as sp
    A3 = sp.csc_matrix(A3)
    bs = plan.bs
    gslot = plan.init_idx[: A3.nnz] // (bs * bs)
    rem = plan.init_idx[: A3.nnz] % (bs * bs)
    pools = np.zeros((dplan.pr, dplan.pc, dplan.n_local, bs, bs),
                     dtype=dtype)
    flat = pools.reshape(dplan.pr * dplan.pc, dplan.n_local * bs * bs)
    np.add.at(flat, (dplan.owner_dev[gslot],
                     dplan.local_slot[gslot] * bs * bs + rem),
              A3.data.astype(dtype))
    if plan.init_ones:
        g2 = plan.init_idx[A3.nnz:] // (bs * bs)
        r2 = plan.init_idx[A3.nnz:] % (bs * bs)
        np.add.at(flat, (dplan.owner_dev[g2],
                         dplan.local_slot[g2] * bs * bs + r2),
                  np.ones(len(g2), dtype=dtype))
    sharding = NamedSharding(grid.mesh, P(R_AXIS, C_AXIS))
    return jax.device_put(pools, sharding)


def _chunked(lo, hi, chunk, body, carry):
    nch = (hi - lo + chunk - 1) // chunk
    return lax.fori_loop(0, nch, body, carry)


def build_dist_factor_fn(plan: SymbolicPlan, dplan: DistPlan2D, grid: Grid2D,
                         *, chunk: int = 16, diag_chunk: int = 4):
    """Compile the SPMD level-batched distributed factorization.

    Returns ``factor(pools, thresh, tapes) -> (pools, linv, uinv, tiny)``
    with pools sharded (pr, pc, n_local, B, B) and linv/uinv replicated.
    """
    nb, bs, nlvl = dplan.nb, dplan.bs, dplan.nlvl
    LBUF = dplan.max_lbuf    # rows [0,LBUF) data, LBUF fill-trash, LBUF+1 zero
    UBUF = dplan.max_ubuf
    mesh = grid.mesh

    dlen = dplan.dstep.shape[-1]
    llen = dplan.lloc.shape[-1]
    ulen = dplan.uloc.shape[-1]
    glen = dplan.glpos.shape[-1]
    blu = jax.vmap(block_lu_inv, in_axes=(0, None))

    def spmd(pools, thresh, dptr, dstep, dloc, lptr, lloc, lpos, lstep,
             uptr, uloc, upos, ustep, gptr, glpos, gupos, gtloc):
        pool = pools[0, 0]
        dptr, dstep, dloc = dptr[0, 0], dstep[0, 0], dloc[0, 0]
        lptr, lloc, lpos, lstep = (lptr[0, 0], lloc[0, 0], lpos[0, 0],
                                   lstep[0, 0])
        uptr, uloc, upos, ustep = (uptr[0, 0], uloc[0, 0], upos[0, 0],
                                   ustep[0, 0])
        gptr, glpos, gupos, gtloc = (gptr[0, 0], glpos[0, 0], gupos[0, 0],
                                     gtloc[0, 0])
        dtype = pool.dtype

        def level(l, carry):
            pool, linv, uinv, tiny = carry

            # --- owned diagonal blocks: batched LU + inverses ---
            lo, hi = dptr[l], dptr[l + 1]
            ldelta = jnp.zeros((nb + 1, bs, bs), dtype)
            udelta = jnp.zeros((nb + 1, bs, bs), dtype)

            def diag(c, carry):
                pool, ldelta, udelta, tiny = carry
                offs = lo + c * diag_chunk + jnp.arange(diag_chunk,
                                                        dtype=jnp.int32)
                valid = offs < hi
                offs = jnp.minimum(offs, dlen - 1)
                steps = jnp.where(valid, dstep[offs], nb)
                dsl = jnp.where(valid, dloc[offs], _ZERO)
                LU, lk, uk, nt = blu(pool[dsl], thresh)
                pool = pool.at[jnp.where(valid, dsl, _TRASH)].set(LU)
                ldelta = ldelta.at[steps].set(
                    jnp.where(valid[:, None, None], lk, 0))
                udelta = udelta.at[steps].set(
                    jnp.where(valid[:, None, None], uk, 0))
                tiny = tiny + jnp.sum(nt * valid).astype(jnp.int32)
                return pool, ldelta, udelta, tiny

            pool, ldelta, udelta, tiny = _chunked(
                lo, hi, diag_chunk, diag, (pool, ldelta, udelta, tiny))
            # broadcast this level's inverses (fused U-diag/L-diag Isend)
            pack = lax.psum(lax.psum(jnp.stack([ldelta, udelta]), R_AXIS),
                            C_AXIS)
            linv = linv + pack[0]
            uinv = uinv + pack[1]

            # --- L panels: trsm + fill broadcast buffer ---
            lbuf = jnp.zeros((LBUF + 2, bs, bs), dtype)
            llo, lhi = lptr[l], lptr[l + 1]

            def ltrsm(c, carry):
                pool, lbuf = carry
                offs = llo + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
                valid = offs < lhi
                offs = jnp.minimum(offs, llen - 1)
                si = jnp.where(valid, lloc[offs], _TRASH)
                pos = jnp.where(valid, lpos[offs], LBUF)
                st = jnp.where(valid, lstep[offs], nb)
                Y = jnp.einsum("cij,cjk->cik", pool[si], uinv[st],
                               preferred_element_type=dtype,
                               precision=MATMUL_PRECISION)
                pool = pool.at[si].set(Y)
                lbuf = lbuf.at[pos].set(Y)
                return pool, lbuf

            pool, lbuf = _chunked(llo, lhi, chunk, ltrsm, (pool, lbuf))

            # --- U panels ---
            ubuf = jnp.zeros((UBUF + 2, bs, bs), dtype)
            ulo, uhi = uptr[l], uptr[l + 1]

            def utrsm(c, carry):
                pool, ubuf = carry
                offs = ulo + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
                valid = offs < uhi
                offs = jnp.minimum(offs, ulen - 1)
                si = jnp.where(valid, uloc[offs], _TRASH)
                pos = jnp.where(valid, upos[offs], UBUF)
                st = jnp.where(valid, ustep[offs], nb)
                Y = jnp.einsum("cij,cjk->cik", linv[st], pool[si],
                               preferred_element_type=dtype,
                               precision=MATMUL_PRECISION)
                pool = pool.at[si].set(Y)
                ubuf = ubuf.at[pos].set(Y)
                return pool, ubuf

            pool, ubuf = _chunked(ulo, uhi, chunk, utrsm, (pool, ubuf))

            # panel broadcasts (the C_Tree bcast analog)
            lbuf = lax.psum(lbuf, C_AXIS)
            ubuf = lax.psum(ubuf, R_AXIS)

            # --- Schur updates into locally-owned targets ---
            go, gh = gptr[l], gptr[l + 1]

            def gemm(c, pool):
                offs = go + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
                valid = offs < gh
                offs = jnp.minimum(offs, glen - 1)
                li = jnp.where(valid, glpos[offs], LBUF + 1)   # zero row
                ui = jnp.where(valid, gupos[offs], UBUF + 1)
                ti = jnp.where(valid, gtloc[offs], _TRASH)
                Pm = jnp.einsum("cij,cjk->cik", lbuf[li], ubuf[ui],
                                preferred_element_type=dtype,
                                precision=MATMUL_PRECISION)
                return pool.at[ti].add(-Pm)

            pool = _chunked(go, gh, chunk, gemm, pool)
            return pool, linv, uinv, tiny

        linv0 = jnp.zeros((nb + 1, bs, bs), dtype)
        uinv0 = jnp.zeros((nb + 1, bs, bs), dtype)
        pool, linv, uinv, tiny = lax.fori_loop(
            0, nlvl, level, (pool, linv0, uinv0, jnp.zeros((), jnp.int32)))
        tiny = lax.psum(lax.psum(tiny, R_AXIS), C_AXIS)
        return pool[None, None], linv[:nb], uinv[:nb], tiny

    sharded = P(R_AXIS, C_AXIS)
    rep = P()
    fn = shard_map(
        spmd, mesh=mesh,
        in_specs=(sharded, rep) + (sharded,) * 15,
        out_specs=(sharded, rep, rep, rep),
        check_vma=False)

    @jax.jit
    def factor(pools, thresh, tapes):
        return fn(pools, thresh, *tapes)

    return factor


def make_dist_factor_tapes(dplan: DistPlan2D):
    """Device-resident mesh-sharded tape tuple for build_dist_factor_fn."""
    names = ["dptr", "dstep", "dloc", "lptr", "lloc", "lpos", "lstep",
             "uptr", "uloc", "upos", "ustep", "gptr", "glpos", "gupos",
             "gtloc"]
    return tuple(jnp.asarray(getattr(dplan, n), dtype=jnp.int32)
                 for n in names)


def build_dist_solve_fn(plan: SymbolicPlan, dplan: DistPlan2D, grid: Grid2D,
                        nrhs: int, *, chunk: int = 16):
    """Compile the SPMD distributed triangular solves (X replicated,
    per-level psum of partial sums — the lsum/bsum tree-reduce analog)."""
    nb, bs = dplan.nb, dplan.bs
    mesh = grid.mesh
    nlvl_l, nlvl_u = plan.lsol_nlvl, plan.usol_nlvl
    ldptr = jnp.asarray(plan.lsol_dptr, jnp.int32)
    ldiag = jnp.asarray(np.concatenate([plan.lsol_diag, [nb]]), jnp.int32)
    udptr = jnp.asarray(plan.usol_dptr, jnp.int32)
    udiag = jnp.asarray(np.concatenate([plan.usol_diag, [nb]]), jnp.int32)
    ldlen = len(plan.lsol_diag) + 1
    udlen = len(plan.usol_diag) + 1

    lg_len = dplan.lsol_gloc.shape[-1]
    ug_len = dplan.usol_gloc.shape[-1]

    def sweep(pool, dinv, gp, gl, gs, gd, X, nlvl, glen, dptr, diag, dlen):
        dtype = X.dtype

        def level(l, X):
            lo, hi = gp[l], gp[l + 1]
            delta = jnp.zeros_like(X)

            def gemm(c, delta):
                offs = lo + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
                valid = offs < hi
                offs = jnp.minimum(offs, glen - 1)
                si = jnp.where(valid, gl[offs], _ZERO)
                src = jnp.where(valid, gs[offs], 0)
                dst = jnp.where(valid, gd[offs], nb)
                Pm = jnp.einsum("cij,cjk->cik", pool[si], X[src],
                                preferred_element_type=dtype,
                                precision=MATMUL_PRECISION)
                return delta.at[dst].add(-Pm)

            delta = _chunked(lo, hi, chunk, gemm, delta)
            delta = lax.psum(lax.psum(delta, R_AXIS), C_AXIS)
            X = X + delta

            dlo, dhi = dptr[l], dptr[l + 1]

            def dapply(c, X):
                offs = dlo + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
                valid = offs < dhi
                offs = jnp.minimum(offs, dlen - 1)
                I = jnp.where(valid, diag[offs], nb)
                Ic = jnp.minimum(I, nb - 1)
                Y = jnp.einsum("cij,cjk->cik", dinv[Ic], X[I],
                               preferred_element_type=dtype,
                               precision=MATMUL_PRECISION)
                return X.at[I].set(Y)

            return _chunked(dlo, dhi, chunk, dapply, X)

        return lax.fori_loop(0, nlvl, level, X)

    def spmd(pools, linv, uinv, lgp, lgl, lgs, lgd, ugp, ugl, ugs, ugd, b):
        pool = pools[0, 0]
        lgp, lgl, lgs, lgd = lgp[0, 0], lgl[0, 0], lgs[0, 0], lgd[0, 0]
        ugp, ugl, ugs, ugd = ugp[0, 0], ugl[0, 0], ugs[0, 0], ugd[0, 0]
        X = b.reshape(nb, bs, nrhs)
        X = jnp.concatenate([X, jnp.zeros((1, bs, nrhs), X.dtype)], axis=0)
        X = sweep(pool, linv, lgp, lgl, lgs, lgd, X, nlvl_l, lg_len,
                  ldptr, ldiag, ldlen)
        X = sweep(pool, uinv, ugp, ugl, ugs, ugd, X, nlvl_u, ug_len,
                  udptr, udiag, udlen)
        return X[:nb].reshape(nb * bs, nrhs)

    sharded = P(R_AXIS, C_AXIS)
    rep = P()
    fn = shard_map(
        spmd, mesh=mesh,
        in_specs=(sharded, rep, rep) + (sharded,) * 8 + (rep,),
        out_specs=rep, check_vma=False)

    @jax.jit
    def solve(pools, linv, uinv, stapes, b):
        return fn(pools, linv, uinv, *stapes, b)

    return solve


def make_dist_solve_tapes(dplan: DistPlan2D):
    names = ["lsol_gptr", "lsol_gloc", "lsol_gsrc", "lsol_gdst",
             "usol_gptr", "usol_gloc", "usol_gsrc", "usol_gdst"]
    return tuple(jnp.asarray(getattr(dplan, n), dtype=jnp.int32)
                 for n in names)
