"""2D block-cyclic distributed factorization + solve over a device mesh.

TPU-native analog of the reference's 2D algorithm:

- block (I,J) → device (I mod Pr, J mod Pc), exactly the reference's
  block-cyclic layout (superlu_defs.h:380-397);
- the per-supernode L-panel broadcast down the process row and U-panel
  broadcast down the process column (the C_Tree bcasts of pddistribute.c /
  the Isend/Irecv pipeline of pdgstrf.c) become masked psums over the 'c'
  and 'r' mesh axes: the owning device contributes its panel blocks into a
  fixed-size buffer, psum replicates them across the axis, and every device
  GEMMs from the replicated buffer into its locally-owned Schur targets;
- the diagonal factorization is computed by the owner and its triangular
  inverses psum-broadcast (the U-diag block Isend of pdgstrf2.c:142-360);
- the distributed triangular solves keep X replicated and psum per-level
  partial lsum/bsum contributions (replacing the fmod/bmod message-driven
  loops and LBtree/LRtree collectives of pdgstrs.c / pdgstrs_lsum.c).

Per-device work lists are precomputed on the host from the SymbolicPlan
(the distribution phase — pddistribute.c analog) and shipped as
mesh-sharded instruction tapes; the SPMD program is one ``lax.fori_loop``
with three psums per elimination step.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.host.symbolic import SymbolicPlan
from ..ops.kernels.blocklu import block_lu, _tri_invs
from .grid import C_AXIS, R_AXIS, Grid2D

# local pool layout: slot 0 = zero block (never written), slot 1 = trash
_ZERO = 0
_TRASH = 1
_NLOCAL_RESERVED = 2


@dataclasses.dataclass
class DistPlan2D:
    """Per-device instruction tapes, stacked over the (Pr, Pc) grid."""

    pr: int
    pc: int
    nb: int
    bs: int
    n_local: int          # local pool slots (incl. zero/trash)
    max_lbuf: int         # L broadcast buffer rows (excl. trash/zero rows)
    max_ubuf: int

    # value placement: global slot -> (device, local slot)
    owner_dev: np.ndarray     # (nslots,) linear device id r*pc + c
    local_slot: np.ndarray    # (nslots,)

    # factor tapes, all leading dims (pr, pc, ...)
    downer: np.ndarray        # (pr, pc, nb) int8
    dloc: np.ndarray          # (pr, pc, nb)
    lptr: np.ndarray          # (pr, pc, nb+1)
    lloc: np.ndarray          # (pr, pc, Lmax)
    lpos: np.ndarray
    uptr: np.ndarray
    uloc: np.ndarray
    upos: np.ndarray
    gptr: np.ndarray
    glpos: np.ndarray
    gupos: np.ndarray
    gtloc: np.ndarray

    # solve tapes (L then U), per device, grouped by level
    lsol_gptr: np.ndarray     # (pr, pc, nlvl+1)
    lsol_gloc: np.ndarray     # local slot of L(I,J)
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
    ndev = pr * pc
    srow, scol = plan.slot_row, plan.slot_col
    owner_r = (srow % pr).astype(np.int64)
    owner_c = (scol % pc).astype(np.int64)
    owner_dev = owner_r * pc + owner_c

    # local slot numbering per device (stable by global slot id)
    local_slot = np.zeros(plan.nslots, dtype=np.int64)
    counts = np.full(ndev, _NLOCAL_RESERVED, dtype=np.int64)
    order = np.argsort(owner_dev, kind="stable")
    for s in order:
        d = owner_dev[s]
        local_slot[s] = counts[d]
        counts[d] += 1
    n_local = int(counts.max())

    def dev_rc(d):
        return d // pc, d % pc

    # ---------- factor tapes ----------
    downer = np.zeros((pr, pc, nb), dtype=np.int8)
    dloc = np.full((pr, pc, nb), _TRASH, dtype=np.int32)
    l_lists = [[[] for _ in range(nb)] for _ in range(ndev)]
    u_lists = [[[] for _ in range(nb)] for _ in range(ndev)]
    g_lists = [[[] for _ in range(nb)] for _ in range(ndev)]

    # buffer fill positions: for step k, the L blocks (I,k) are ordered by I
    # within each mesh-row r (set of I ≡ r mod pr); every device in mesh row
    # r uses the same ordering. Analogously U by mesh-col.
    max_lbuf = 1
    max_ubuf = 1
    for k in range(nb):
        ds = plan.diag_slot[k]
        r0, c0 = int(srow[ds] % pr), int(scol[ds] % pc)
        downer[r0, c0, k] = 1
        dloc[r0, c0, k] = local_slot[ds]

        lo, hi = plan.l_ptr[k], plan.l_ptr[k + 1]
        lsl = plan.l_slots[lo:hi]
        rows_k = plan.slot_row[lsl]
        # position of each L block within its mesh row's broadcast buffer
        lpos_k = np.zeros(len(lsl), dtype=np.int64)
        for r in range(pr):
            sel = np.flatnonzero(rows_k % pr == r)
            lpos_k[sel] = np.arange(len(sel))
            max_lbuf = max(max_lbuf, len(sel))
        for t, s in enumerate(lsl):
            d = owner_dev[s]
            l_lists[d][k].append((local_slot[s], lpos_k[t]))

        uo, uh = plan.u_ptr[k], plan.u_ptr[k + 1]
        usl = plan.u_slots[uo:uh]
        cols_k = plan.slot_col[usl]
        upos_k = np.zeros(len(usl), dtype=np.int64)
        for c in range(pc):
            sel = np.flatnonzero(cols_k % pc == c)
            upos_k[sel] = np.arange(len(sel))
            max_ubuf = max(max_ubuf, len(sel))
        for t, s in enumerate(usl):
            d = owner_dev[s]
            u_lists[d][k].append((local_slot[s], upos_k[t]))

        # gemm triples: target owner does the work, reading from buffers
        go, gh = plan.g_ptr[k], plan.g_ptr[k + 1]
        lpos_of = {int(s): int(p) for s, p in zip(lsl, lpos_k)}
        upos_of = {int(s): int(p) for s, p in zip(usl, upos_k)}
        for t in range(go, gh):
            tgt = plan.g_t[t]
            d = owner_dev[tgt]
            g_lists[d][k].append((lpos_of[int(plan.g_l[t])],
                                  upos_of[int(plan.g_u[t])],
                                  local_slot[tgt]))

    def pack(lists, nfields):
        """lists[d][k] = [(f0, f1, ...)] → ptr (pr,pc,nb+1) + padded fields."""
        ptr = np.zeros((ndev, nb + 1), dtype=np.int64)
        for d in range(ndev):
            for k in range(nb):
                ptr[d, k + 1] = ptr[d, k] + len(lists[d][k])
        maxlen = max(1, int(ptr[:, -1].max()))
        out = [np.zeros((ndev, maxlen), dtype=np.int32)
               for _ in range(nfields)]
        for d in range(ndev):
            pos = 0
            for k in range(nb):
                for item in lists[d][k]:
                    for f in range(nfields):
                        out[f][d, pos] = item[f]
                    pos += 1
        ptr = ptr.reshape(pr, pc, nb + 1).astype(np.int32)
        out = [o.reshape(pr, pc, maxlen) for o in out]
        return ptr, out

    lptr, (lloc, lpos) = pack(l_lists, 2)
    uptr, (uloc, upos) = pack(u_lists, 2)
    gptr, (glpos, gupos, gtloc) = pack(g_lists, 3)

    # ---------- solve tapes: group each sweep's gemms by (device, level) ----
    def solve_pack(gptr_g, gslot_g, gsrc_g, gdst_g, nlvl):
        lists = [[[] for _ in range(nlvl)] for _ in range(ndev)]
        for l in range(nlvl):
            for t in range(gptr_g[l], gptr_g[l + 1]):
                s = gslot_g[t]
                d = owner_dev[s]
                lists[d][l].append((local_slot[s], gsrc_g[t], gdst_g[t]))
        ptr = np.zeros((ndev, nlvl + 1), dtype=np.int64)
        for d in range(ndev):
            for l in range(nlvl):
                ptr[d, l + 1] = ptr[d, l] + len(lists[d][l])
        maxlen = max(1, int(ptr[:, -1].max()))
        loc = np.zeros((ndev, maxlen), dtype=np.int32)
        src = np.zeros((ndev, maxlen), dtype=np.int32)
        dst = np.full((ndev, maxlen), nb, dtype=np.int32)
        for d in range(ndev):
            pos = 0
            for l in range(nlvl):
                for (a, b, c) in lists[d][l]:
                    loc[d, pos] = a
                    src[d, pos] = b
                    dst[d, pos] = c
                    pos += 1
        return (ptr.reshape(pr, pc, nlvl + 1).astype(np.int32),
                loc.reshape(pr, pc, maxlen), src.reshape(pr, pc, maxlen),
                dst.reshape(pr, pc, maxlen))

    lsg = solve_pack(plan.lsol_gptr, plan.lsol_gslot, plan.lsol_gsrc,
                     plan.lsol_gdst, plan.lsol_nlvl)
    usg = solve_pack(plan.usol_gptr, plan.usol_gslot, plan.usol_gsrc,
                     plan.usol_gdst, plan.usol_nlvl)

    return DistPlan2D(
        pr=pr, pc=pc, nb=nb, bs=plan.bs, n_local=n_local,
        max_lbuf=max_lbuf, max_ubuf=max_ubuf,
        owner_dev=owner_dev, local_slot=local_slot,
        downer=downer, dloc=dloc,
        lptr=lptr, lloc=lloc, lpos=lpos,
        uptr=uptr, uloc=uloc, upos=upos,
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
    coo = A3.tocoo()
    bs, nb = plan.bs, plan.nb
    key = (coo.row // bs).astype(np.int64) * nb + (coo.col // bs)
    # global slot of each nonzero: reuse the plan's init indices
    gslot = plan.init_idx[: A3.nnz] // (bs * bs)
    rem = plan.init_idx[: A3.nnz] % (bs * bs)
    pools = np.zeros((dplan.pr, dplan.pc, dplan.n_local, bs, bs),
                     dtype=dtype)
    dev = dplan.owner_dev[gslot]
    loc = dplan.local_slot[gslot]
    flat = pools.reshape(dplan.pr * dplan.pc, dplan.n_local * bs * bs)
    np.add.at(flat, (dev, loc * bs * bs + rem), coo.data.astype(dtype))
    # padding identity tail
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
                         *, chunk: int = 16):
    """Compile the SPMD distributed factorization.

    Returns ``factor(pools, thresh, tapes) -> (pools, linv, uinv, tiny)``
    with pools sharded (pr, pc, n_local, B, B) and linv/uinv replicated.
    """
    nb, bs = dplan.nb, dplan.bs
    LBUF = dplan.max_lbuf    # rows [0,LBUF) data, LBUF fill-trash, LBUF+1 zero
    UBUF = dplan.max_ubuf
    mesh = grid.mesh

    ltape_len = dplan.lloc.shape[-1]
    utape_len = dplan.uloc.shape[-1]
    gtape_len = dplan.glpos.shape[-1]

    def spmd(pools, thresh, downer, dloc, lptr, lloc, lpos, uptr, uloc, upos,
             gptr, glpos, gupos, gtloc):
        # strip the (1,1) device dims shard_map leaves on sharded args
        pool = pools[0, 0]
        downer, dloc = downer[0, 0], dloc[0, 0]
        lptr, lloc, lpos = lptr[0, 0], lloc[0, 0], lpos[0, 0]
        uptr, uloc, upos = uptr[0, 0], uloc[0, 0], upos[0, 0]
        gptr, glpos, gupos, gtloc = (gptr[0, 0], glpos[0, 0], gupos[0, 0],
                                     gtloc[0, 0])
        dtype = pool.dtype
        linv0 = jnp.zeros((nb, bs, bs), dtype)
        uinv0 = jnp.zeros((nb, bs, bs), dtype)

        def step(k, carry):
            pool, linv, uinv, tiny = carry
            own = downer[k]
            ds = dloc[k]
            # non-owners factor the identity (keeps everything finite)
            D = jnp.where(own > 0, pool[ds], jnp.eye(bs, dtype=dtype))
            LU, nt = block_lu(D, thresh)
            lk, uk = _tri_invs(LU)
            ownf = own.astype(dtype)
            pack = jnp.stack([lk, uk]) * ownf
            pack = lax.psum(lax.psum(pack, R_AXIS), C_AXIS)
            lk, uk = pack[0], pack[1]
            pool = pool.at[jnp.where(own > 0, ds, _TRASH)].set(LU)
            linv = linv.at[k].set(lk)
            uinv = uinv.at[k].set(uk)
            tiny = tiny + nt * own

            # --- L panel trsm + buffer fill ---
            lbuf = jnp.zeros((LBUF + 2, bs, bs), dtype)
            lo, hi = lptr[k], lptr[k + 1]

            def ltrsm(c, carry):
                pool, lbuf = carry
                offs = lo + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
                valid = offs < hi
                offs = jnp.minimum(offs, ltape_len - 1)
                si = jnp.where(valid, lloc[offs], _TRASH)
                pos = jnp.where(valid, lpos[offs], LBUF)
                Y = jnp.einsum("cij,jk->cik", pool[si], uk,
                               preferred_element_type=dtype)
                pool = pool.at[si].set(Y)
                lbuf = lbuf.at[pos].set(Y)
                return pool, lbuf

            pool, lbuf = _chunked(lo, hi, chunk, ltrsm, (pool, lbuf))

            # --- U panel trsm + buffer fill ---
            ubuf = jnp.zeros((UBUF + 2, bs, bs), dtype)
            uo, uh = uptr[k], uptr[k + 1]

            def utrsm(c, carry):
                pool, ubuf = carry
                offs = uo + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
                valid = offs < uh
                offs = jnp.minimum(offs, utape_len - 1)
                si = jnp.where(valid, uloc[offs], _TRASH)
                pos = jnp.where(valid, upos[offs], UBUF)
                Y = jnp.einsum("ij,cjk->cik", lk, pool[si],
                               preferred_element_type=dtype)
                pool = pool.at[si].set(Y)
                ubuf = ubuf.at[pos].set(Y)
                return pool, ubuf

            pool, ubuf = _chunked(uo, uh, chunk, utrsm, (pool, ubuf))

            # panel broadcasts (the C_Tree bcast analog)
            lbuf = lax.psum(lbuf, C_AXIS)   # L panel across the mesh row
            ubuf = lax.psum(ubuf, R_AXIS)   # U panel down the mesh column

            # --- Schur updates into locally-owned targets ---
            go, gh = gptr[k], gptr[k + 1]

            def gemm(c, pool):
                offs = go + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
                valid = offs < gh
                offs = jnp.minimum(offs, gtape_len - 1)
                li = jnp.where(valid, glpos[offs], LBUF + 1)   # zero row
                ui = jnp.where(valid, gupos[offs], UBUF + 1)
                ti = jnp.where(valid, gtloc[offs], _TRASH)
                Pm = jnp.einsum("cij,cjk->cik", lbuf[li], ubuf[ui],
                                preferred_element_type=dtype)
                return pool.at[ti].add(-Pm)

            pool = _chunked(go, gh, chunk, gemm, pool)
            return pool, linv, uinv, tiny

        pool, linv, uinv, tiny = lax.fori_loop(
            0, nb, step, (pool, linv0, uinv0, jnp.zeros((), jnp.int32)))
        tiny = lax.psum(lax.psum(tiny, R_AXIS), C_AXIS)
        return pool[None, None], linv, uinv, tiny

    sharded = P(R_AXIS, C_AXIS)
    rep = P()
    fn = shard_map(
        spmd, mesh=mesh,
        in_specs=(sharded, rep) + (sharded,) * 12,
        out_specs=(sharded, rep, rep, rep),
        check_rep=False)

    @jax.jit
    def factor(pools, thresh, tapes):
        return fn(pools, thresh, *tapes)

    return factor


def make_dist_factor_tapes(dplan: DistPlan2D):
    """Device-resident mesh-sharded tape tuple for build_dist_factor_fn."""
    names = ["downer", "dloc", "lptr", "lloc", "lpos", "uptr", "uloc",
             "upos", "gptr", "glpos", "gupos", "gtloc"]
    return tuple(jnp.asarray(getattr(dplan, n), dtype=jnp.int32)
                 for n in names)


def build_dist_solve_fn(plan: SymbolicPlan, dplan: DistPlan2D, grid: Grid2D,
                        nrhs: int, *, chunk: int = 16):
    """Compile the SPMD distributed triangular solves (X replicated,
    per-level psum of partial sums — the lsum/bsum tree-reduce analog)."""
    nb, bs = dplan.nb, dplan.bs
    mesh = grid.mesh
    nlvl_l, nlvl_u = plan.lsol_nlvl, plan.usol_nlvl
    # global (replicated) diag tapes
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
                                preferred_element_type=dtype)
                return delta.at[dst].add(-Pm)

            delta = _chunked(lo, hi, chunk, gemm, delta)
            delta = lax.psum(lax.psum(delta, R_AXIS), C_AXIS)
            X = X + delta

            # replicated diagonal application
            dlo, dhi = dptr[l], dptr[l + 1]

            def dapply(c, X):
                offs = dlo + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
                valid = offs < dhi
                offs = jnp.minimum(offs, dlen - 1)
                I = jnp.where(valid, diag[offs], nb)
                Ic = jnp.minimum(I, nb - 1)
                Y = jnp.einsum("cij,cjk->cik", dinv[Ic], X[I],
                               preferred_element_type=dtype)
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
        out_specs=rep, check_rep=False)

    @jax.jit
    def solve(pools, linv, uinv, stapes, b):
        return fn(pools, linv, uinv, *stapes, b)

    return solve


def make_dist_solve_tapes(dplan: DistPlan2D):
    names = ["lsol_gptr", "lsol_gloc", "lsol_gsrc", "lsol_gdst",
             "usol_gptr", "usol_gloc", "usol_gsrc", "usol_gdst"]
    return tuple(jnp.asarray(getattr(dplan, n), dtype=jnp.int32)
                 for n in names)
