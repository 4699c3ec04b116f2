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
    max_dlvl: int         # max elimination steps per level (compact
                          # inverse-broadcast buffer rows)

    # value placement: global slot -> (device, local slot)
    owner_dev: np.ndarray     # (nslots,) linear device id r*pc + c
    local_slot: np.ndarray    # (nslots,)

    # factor tapes, all leading dims (pr, pc, ...)
    dptr: np.ndarray          # (pr, pc, nlvl+1) owned diag ranges
    dstep: np.ndarray         # step ids of owned diag blocks
    dloc: np.ndarray          # local slots of owned diag blocks
    dpos: np.ndarray          # position of the step within its level
    lptr: np.ndarray          # (pr, pc, nlvl+1)
    lloc: np.ndarray          # owned L-panel local slots
    lpos: np.ndarray          # fill position in the level's L buffer
    lpil: np.ndarray          # owning step's position within its level
    uptr: np.ndarray
    uloc: np.ndarray
    upos: np.ndarray
    upil: np.ndarray
    gptr: np.ndarray
    glpos: np.ndarray
    gupos: np.ndarray
    gtloc: np.ndarray
    dinv_idx: np.ndarray      # (nb,) owner-local inverse index of step k

    # solve tapes (L then U), per device, grouped by level
    lsol_gptr: np.ndarray
    lsol_gloc: np.ndarray
    lsol_gsrc: np.ndarray
    lsol_gdst: np.ndarray     # compact position within the level's buffer
    usol_gptr: np.ndarray
    usol_gloc: np.ndarray
    usol_gsrc: np.ndarray
    usol_gdst: np.ndarray
    # replicated: global rows of each solve level's compact delta buffer
    lsol_rows: np.ndarray     # (lsol_nlvl, max_lact) fill nb
    usol_rows: np.ndarray
    # owner-only diagonal applies per solve level
    ldsol_ptr: np.ndarray     # (pr, pc, lsol_nlvl+1)
    ldsol_row: np.ndarray     # global block row I
    ldsol_pos: np.ndarray     # position within the level's diag buffer
    ldsol_inv: np.ndarray     # owner-local inverse index
    udsol_ptr: np.ndarray
    udsol_row: np.ndarray
    udsol_pos: np.ndarray
    udsol_inv: np.ndarray
    lsol_drows: np.ndarray    # (lsol_nlvl, max_ldact) fill nb
    usol_drows: np.ndarray

    # ---- comm accounting (bytes moved per psum, for Stats counters) ----
    def comm_volume(self, itemsize: int, nrhs: int = 1) -> dict:
        """Per-phase collective volume in bytes (one axis-psum counted
        once). Compact buffers make solve volume proportional to the
        active rows per level (fmod/fsendx analog, pdgstrs.c:344-827)."""
        bsb = self.bs * self.bs * itemsize
        fac = self.nlvl * (2 * (self.max_dlvl + 1)
                           + (self.max_lbuf + 2) + (self.max_ubuf + 2)) * bsb
        xrow = self.bs * nrhs * itemsize
        sol = ((self.lsol_rows.shape[0] * (self.lsol_rows.shape[1] + 1)
                + self.usol_rows.shape[0] * (self.usol_rows.shape[1] + 1)
                + self.lsol_drows.shape[0] * (self.lsol_drows.shape[1] + 1)
                + self.usol_drows.shape[0] * (self.usol_drows.shape[1] + 1))
               * xrow)
        return {"factor_psum_bytes": int(fac), "solve_psum_bytes": int(sol)}


def _solve_pack(plan, owner_dev, local_slot, pr, pc,
                gptr_g, gslot_g, gsrc_g, gdst_g, snlvl):
    """Group one sweep's gemms by (device, level); destinations remapped
    to compact per-level buffer positions (comm volume per level ∝ active
    rows — the fmod/fsendx participant-list analog, pdgstrs.c:344-827)."""
    nb = plan.nb
    ndev = pr * pc
    # compact position of each active destination row per level
    rows_per_lvl = []
    pos_of = [dict() for _ in range(snlvl)]
    for l in range(snlvl):
        dsts = np.unique(np.asarray(
            gdst_g[gptr_g[l]:gptr_g[l + 1]], dtype=np.int64))
        pos_of[l] = {int(r): i for i, r in enumerate(dsts)}
        rows_per_lvl.append(dsts)
    max_act = max(1, max((len(r) for r in rows_per_lvl), default=1))
    lvl_rows = np.full((max(snlvl, 1), max_act), nb, dtype=np.int32)
    for l, r in enumerate(rows_per_lvl):
        lvl_rows[l, : len(r)] = r

    lists = [[[] for _ in range(snlvl)] for _ in range(ndev)]
    for l in range(snlvl):
        for t in range(gptr_g[l], gptr_g[l + 1]):
            s = gslot_g[t]
            lists[owner_dev[s]][l].append(
                (int(local_slot[s]), int(gsrc_g[t]),
                 pos_of[l][int(gdst_g[t])]))
    ptr = np.zeros((ndev, snlvl + 1), dtype=np.int64)
    for d in range(ndev):
        for l in range(snlvl):
            ptr[d, l + 1] = ptr[d, l] + len(lists[d][l])
    maxlen = max(1, int(ptr[:, -1].max()))
    loc = np.full((ndev, maxlen), _ZERO, dtype=np.int32)
    src = np.zeros((ndev, maxlen), dtype=np.int32)
    dst = np.full((ndev, maxlen), max_act, dtype=np.int32)
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
            dst.reshape(pr, pc, maxlen), lvl_rows)


def _diag_pack(plan, owner_dev, local_slot, dinv_idx, pr, pc,
               dptr_g, diag_g, snlvl):
    """Owner-only diagonal applies per solve level (see _solve_pack)."""
    nb = plan.nb
    ndev = pr * pc
    lists = [[[] for _ in range(snlvl)] for _ in range(ndev)]
    max_dact = 1
    drows = np.full((max(snlvl, 1),
                     max(1, int(np.max(np.diff(dptr_g))
                                if len(dptr_g) > 1 else 1))),
                    nb, dtype=np.int32)
    for l in range(snlvl):
        rows = np.asarray(diag_g[dptr_g[l]:dptr_g[l + 1]], np.int64)
        max_dact = max(max_dact, len(rows))
        drows[l, : len(rows)] = rows
        for p, I in enumerate(rows):
            s = plan.diag_slot[I]
            lists[owner_dev[s]][l].append(
                (int(I), p, int(dinv_idx[I])))
    drows = drows[:, :max_dact]
    ptr = np.zeros((ndev, snlvl + 1), dtype=np.int64)
    for d in range(ndev):
        for l in range(snlvl):
            ptr[d, l + 1] = ptr[d, l] + len(lists[d][l])
    maxlen = max(1, int(ptr[:, -1].max()))
    row = np.full((ndev, maxlen), nb, dtype=np.int32)
    pos = np.full((ndev, maxlen), max_dact, dtype=np.int32)
    inv = np.zeros((ndev, maxlen), dtype=np.int32)
    for d in range(ndev):
        p0 = 0
        for l in range(snlvl):
            for (a, b, c) in lists[d][l]:
                row[d, p0] = a
                pos[d, p0] = b
                inv[d, p0] = c
                p0 += 1
    return (ptr.reshape(pr, pc, snlvl + 1).astype(np.int32),
            row.reshape(pr, pc, maxlen), pos.reshape(pr, pc, maxlen),
            inv.reshape(pr, pc, maxlen), drows)


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
    max_dlvl = max(1, max((len(s) for s in steps_by_level), default=1))
    pil_of_step = np.zeros(nb, dtype=np.int64)   # position within level
    for sl in steps_by_level:
        pil_of_step[sl] = np.arange(len(sl))

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
            d_lists[d][l].append((int(k), int(local_slot[ds]),
                                  int(pil_of_step[k])))

            lo, hi = plan.l_ptr[k], plan.l_ptr[k + 1]
            for s in plan.l_slots[lo:hi]:
                r = int(srow[s] % pr)
                pos = int(lrow_count[r])
                lrow_count[r] += 1
                lpos_of[int(s)] = pos
                l_lists[owner_dev[s]][l].append(
                    (int(local_slot[s]), pos, int(pil_of_step[k])))
            uo, uh = plan.u_ptr[k], plan.u_ptr[k + 1]
            for s in plan.u_slots[uo:uh]:
                c = int(scol[s] % pc)
                pos = int(ucol_count[c])
                ucol_count[c] += 1
                upos_of[int(s)] = pos
                u_lists[owner_dev[s]][l].append(
                    (int(local_slot[s]), pos, int(pil_of_step[k])))
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

    dptr, (dstep, dloc, dpos) = pack(d_lists, 3, fills=[nb, _TRASH, max_dlvl])
    lptr, (lloc, lpos, lpil) = pack(l_lists, 3, fills=[_TRASH, 0, max_dlvl])
    uptr, (uloc, upos, upil) = pack(u_lists, 3, fills=[_TRASH, 0, max_dlvl])
    gptr, (glpos, gupos, gtloc) = pack(g_lists, 3)

    # owner-local inverse index of each step: its position in the owner's
    # d tape (the factor stores inverses at that position)
    dinv_idx = np.zeros(nb, dtype=np.int64)
    dstep_flat = dstep.reshape(ndev, -1)
    for d in range(ndev):
        for i, k in enumerate(dstep_flat[d]):
            if k < nb:
                dinv_idx[k] = i

    lsg = _solve_pack(plan, owner_dev, local_slot, pr, pc,
                      plan.lsol_gptr, plan.lsol_gslot, plan.lsol_gsrc,
                      plan.lsol_gdst, plan.lsol_nlvl)
    usg = _solve_pack(plan, owner_dev, local_slot, pr, pc,
                      plan.usol_gptr, plan.usol_gslot, plan.usol_gsrc,
                      plan.usol_gdst, plan.usol_nlvl)

    ldg = _diag_pack(plan, owner_dev, local_slot, dinv_idx, pr, pc,
                     plan.lsol_dptr, plan.lsol_diag, plan.lsol_nlvl)
    udg = _diag_pack(plan, owner_dev, local_slot, dinv_idx, pr, pc,
                     plan.usol_dptr, plan.usol_diag, plan.usol_nlvl)

    return DistPlan2D(
        pr=pr, pc=pc, nb=nb, bs=plan.bs, nlvl=nlvl, n_local=n_local,
        max_lbuf=max_lbuf, max_ubuf=max_ubuf, max_dlvl=max_dlvl,
        owner_dev=owner_dev, local_slot=local_slot,
        dptr=dptr, dstep=dstep, dloc=dloc, dpos=dpos,
        lptr=lptr, lloc=lloc, lpos=lpos, lpil=lpil,
        uptr=uptr, uloc=uloc, upos=upos, upil=upil,
        gptr=gptr, glpos=glpos, gupos=gupos, gtloc=gtloc,
        dinv_idx=dinv_idx,
        lsol_gptr=lsg[0], lsol_gloc=lsg[1], lsol_gsrc=lsg[2],
        lsol_gdst=lsg[3], lsol_rows=lsg[4],
        usol_gptr=usg[0], usol_gloc=usg[1], usol_gsrc=usg[2],
        usol_gdst=usg[3], usol_rows=usg[4],
        ldsol_ptr=ldg[0], ldsol_row=ldg[1], ldsol_pos=ldg[2],
        ldsol_inv=ldg[3], lsol_drows=ldg[4],
        udsol_ptr=udg[0], udsol_row=udg[1], udsol_pos=udg[2],
        udsol_inv=udg[3], usol_drows=udg[4],
    )


def init_local_pools(plan: SymbolicPlan, dplan: DistPlan2D, A3, dtype,
                     grid: Grid2D) -> jax.Array:
    """Build the distributed block pool as a mesh-sharded array
    ((pr, pc, n_local, B, B), sharded over ('r','c')).

    Owner-computed, no global pool gather (dReDistribute_A analog,
    pddistribute.c:66-433): each device's shard is scattered
    independently inside ``make_array_from_callback``, so peak host
    memory is ONE device's shard plus the (sorted) value stream — never
    the (pr, pc, n_local, B, B) global array. The reference flags the
    global-gather alternative as the memory bottleneck
    (pdgssvx.c:1309)."""
    import scipy.sparse as sp
    A3 = sp.csc_matrix(A3)
    bs = plan.bs
    bb = bs * bs
    nnz = A3.nnz
    idx = np.asarray(plan.init_idx)
    gslot = idx // bb
    rem = idx % bb
    dev = np.asarray(dplan.owner_dev)[gslot]
    off = np.asarray(dplan.local_slot)[gslot] * bb + rem
    vals = np.concatenate([np.asarray(A3.data, dtype=dtype),
                           np.ones(len(idx) - nnz, dtype=dtype)]) \
        if len(idx) > nnz else np.asarray(A3.data, dtype=dtype)

    # group entries by owner device
    order = np.argsort(dev, kind="stable")
    dev_s, off_s, val_s = dev[order], off[order], vals[order]
    ndev = dplan.pr * dplan.pc
    dptr = np.searchsorted(dev_s, np.arange(ndev + 1))

    shard_shape = (1, 1, dplan.n_local, bs, bs)

    def make_shard(index):
        # index: global-array slice for this shard -> (r, c)
        r = index[0].start or 0
        c = index[1].start or 0
        d = r * dplan.pc + c
        flat = np.zeros(dplan.n_local * bb, dtype=dtype)
        lo, hi = dptr[d], dptr[d + 1]
        np.add.at(flat, off_s[lo:hi], val_s[lo:hi])
        return flat.reshape(shard_shape)

    sharding = NamedSharding(grid.mesh, P(R_AXIS, C_AXIS))
    return jax.make_array_from_callback(
        (dplan.pr, dplan.pc, dplan.n_local, bs, bs), sharding, make_shard)


def _chunked(lo, hi, chunk, body, carry):
    nch = (hi - lo + chunk - 1) // chunk
    return lax.fori_loop(0, nch, body, carry)


def build_dist_factor_fn(plan: SymbolicPlan, dplan: DistPlan2D, grid: Grid2D,
                         *, chunk: int = 16, diag_chunk: int = 4,
                         prefix: bool = False):
    """Compile the SPMD level-batched distributed factorization.

    Returns ``factor(pools, thresh, tapes) -> (pools, linvL, uinvL, tiny)``
    with pools sharded (pr, pc, n_local, B, B) and linvL/uinvL the
    OWNER-LOCAL diagonal inverses, sharded (pr, pc, dlen+1, B, B) and
    aligned with the device's d tape (``dinv_idx`` maps step -> row).
    The per-level inverse broadcast is a COMPACT psum of just the level's
    steps (max_dlvl+1 rows), not an (nb+1)-row buffer — the collective
    volume per level is proportional to the level's elimination steps
    (the fused U-diag/L-diag Isend analog, pdgstrf2.c:142-360)."""
    nb, bs, nlvl = dplan.nb, dplan.bs, dplan.nlvl
    LBUF = dplan.max_lbuf    # rows [0,LBUF) data, LBUF fill-trash, LBUF+1 zero
    UBUF = dplan.max_ubuf
    DL = dplan.max_dlvl      # compact inverse buffer rows (+1 pad)
    mesh = grid.mesh

    dlen = dplan.dstep.shape[-1]
    llen = dplan.lloc.shape[-1]
    ulen = dplan.uloc.shape[-1]
    glen = dplan.glpos.shape[-1]
    blu = jax.vmap(block_lu_inv, in_axes=(0, None))

    def spmd(pools, thresh, lmax, dptr, dstep, dloc, dpos, lptr, lloc,
             lpos, lpil, uptr, uloc, upos, upil, gptr, glpos, gupos,
             gtloc):
        pool = pools[0, 0]
        dptr, dstep, dloc, dpos = (dptr[0, 0], dstep[0, 0], dloc[0, 0],
                                   dpos[0, 0])
        lptr, lloc, lpos, lpil = (lptr[0, 0], lloc[0, 0], lpos[0, 0],
                                  lpil[0, 0])
        uptr, uloc, upos, upil = (uptr[0, 0], uloc[0, 0], upos[0, 0],
                                  upil[0, 0])
        gptr, glpos, gupos, gtloc = (gptr[0, 0], glpos[0, 0], gupos[0, 0],
                                     gtloc[0, 0])
        dtype = pool.dtype

        def level(l, carry):
            pool, linvL, uinvL, tiny = carry

            # --- owned diagonal blocks: batched LU + inverses ---
            lo, hi = dptr[l], dptr[l + 1]
            ldelta = jnp.zeros((DL + 1, bs, bs), dtype)
            udelta = jnp.zeros((DL + 1, bs, bs), dtype)

            def diag(c, carry):
                pool, linvL, uinvL, ldelta, udelta, tiny = carry
                offs = lo + c * diag_chunk + jnp.arange(diag_chunk,
                                                        dtype=jnp.int32)
                valid = offs < hi
                offs = jnp.minimum(offs, dlen - 1)
                pil = jnp.where(valid, dpos[offs], DL)
                dsl = jnp.where(valid, dloc[offs], _ZERO)
                LU, lk, uk, nt = blu(pool[dsl], thresh)
                pool = pool.at[jnp.where(valid, dsl, _TRASH)].set(LU)
                lkm = jnp.where(valid[:, None, None], lk, 0)
                ukm = jnp.where(valid[:, None, None], uk, 0)
                ldelta = ldelta.at[pil].set(lkm)
                udelta = udelta.at[pil].set(ukm)
                # owner-local persistent copy at the d-tape position
                sto = jnp.where(valid, offs, dlen)
                linvL = linvL.at[sto].set(lkm)
                uinvL = uinvL.at[sto].set(ukm)
                tiny = tiny + jnp.sum(nt * valid).astype(jnp.int32)
                return pool, linvL, uinvL, ldelta, udelta, tiny

            pool, linvL, uinvL, ldelta, udelta, tiny = _chunked(
                lo, hi, diag_chunk, diag,
                (pool, linvL, uinvL, ldelta, udelta, tiny))
            # broadcast this level's inverses (compact rows only)
            pack = lax.psum(lax.psum(jnp.stack([ldelta, udelta]), R_AXIS),
                            C_AXIS)
            lC = pack[0]        # (DL+1, bs, bs): row DL stays zero
            uC = pack[1]

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
                st = jnp.where(valid, lpil[offs], DL)
                Y = jnp.einsum("cij,cjk->cik", pool[si], uC[st],
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
                st = jnp.where(valid, upil[offs], DL)
                Y = jnp.einsum("cij,cjk->cik", lC[st], pool[si],
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
            return pool, linvL, uinvL, tiny

        linv0 = jnp.zeros((dlen + 1, bs, bs), dtype)
        uinv0 = jnp.zeros((dlen + 1, bs, bs), dtype)
        # prefix mode runs levels [0, lmax) with lmax a runtime scalar
        # (one compile serves every prefix — the per-level profiler)
        pool, linvL, uinvL, tiny = lax.fori_loop(
            0, lmax if prefix else nlvl, level,
            (pool, linv0, uinv0, jnp.zeros((), jnp.int32)))
        tiny = lax.psum(lax.psum(tiny, R_AXIS), C_AXIS)
        return pool[None, None], linvL[None, None], uinvL[None, None], tiny

    sharded = P(R_AXIS, C_AXIS)
    rep = P()
    fn = shard_map(
        spmd, mesh=mesh,
        in_specs=(sharded, rep, rep) + (sharded,) * 16,
        out_specs=(sharded, sharded, sharded, rep),
        check_vma=False)

    if prefix:
        @jax.jit
        def factor_prefix(pools, thresh, tapes, lmax):
            return fn(pools, thresh, lmax, *tapes)

        return factor_prefix

    @jax.jit
    def factor(pools, thresh, tapes):
        return fn(pools, thresh, jnp.int32(nlvl), *tapes)

    return factor


def make_dist_factor_tapes(dplan: DistPlan2D):
    """Device-resident mesh-sharded tape tuple for build_dist_factor_fn."""
    names = ["dptr", "dstep", "dloc", "dpos", "lptr", "lloc", "lpos", "lpil",
             "uptr", "uloc", "upos", "upil", "gptr", "glpos", "gupos",
             "gtloc"]
    return tuple(jnp.asarray(getattr(dplan, n), dtype=jnp.int32)
                 for n in names)


def _make_sweep(nb, bs, nrhs, chunk, *, transpose: bool):
    """One level-set triangular sweep body (shared by the forward and the
    transposed solves). ``transpose`` applies the pool blocks and diagonal
    inverses transposed — the trans branches of pdgstrs (the reference's
    options->Trans contract, superlu_defs.h:684-728)."""
    eq = "cji,cjk->cik" if transpose else "cij,cjk->cik"

    def sweep(pool, dinvL, gp, gl, gs, gd, dp, drow, dpos, dinv_i,
              X, nlvl, glen, max_act, lvl_rows, dlen, max_dact, lvl_drows):
        dtype = X.dtype
        dloc_n = dinvL.shape[0] - 1

        def level(l, X):
            lo, hi = gp[l], gp[l + 1]
            # compact partial sums over the level's active rows
            delta = jnp.zeros((max_act + 1, bs, nrhs), dtype)

            def gemm(c, delta):
                offs = lo + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
                valid = offs < hi
                offs = jnp.minimum(offs, glen - 1)
                si = jnp.where(valid, gl[offs], _ZERO)
                src = jnp.where(valid, gs[offs], 0)
                dst = jnp.where(valid, gd[offs], max_act)
                Pm = jnp.einsum(eq, pool[si], X[src],
                                preferred_element_type=dtype,
                                precision=MATMUL_PRECISION)
                return delta.at[dst].add(-Pm)

            delta = _chunked(lo, hi, chunk, gemm, delta)
            delta = lax.psum(lax.psum(delta, R_AXIS), C_AXIS)
            X = X.at[lvl_rows[l]].add(delta[:max_act])

            # owner-only diagonal applies, broadcast as a compact buffer
            dlo, dhi = dp[l], dp[l + 1]
            dbuf = jnp.zeros((max_dact + 1, bs, nrhs), dtype)

            def dapply(c, dbuf):
                offs = dlo + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
                valid = offs < dhi
                offs = jnp.minimum(offs, dlen - 1)
                I = jnp.where(valid, drow[offs], nb)
                p = jnp.where(valid, dpos[offs], max_dact)
                ii = jnp.where(valid, dinv_i[offs], dloc_n)
                Y = jnp.einsum(eq, dinvL[ii], X[I],
                               preferred_element_type=dtype,
                               precision=MATMUL_PRECISION)
                return dbuf.at[p].add(Y - X[I])

            dbuf = _chunked(dlo, dhi, chunk, dapply, dbuf)
            dbuf = lax.psum(lax.psum(dbuf, R_AXIS), C_AXIS)
            return X.at[lvl_drows[l]].add(dbuf[:max_dact])

        return lax.fori_loop(0, nlvl, level, X)

    return sweep


def solve_sweeps_core(plan: SymbolicPlan, dplan: DistPlan2D, nrhs: int, *,
                      chunk: int = 16):
    """Per-device L+U sweep body, callable INSIDE a shard_map region.

    Returns ``run(pool, linvL, uinvL, local_tapes, b)`` where every array
    is the device-local shard (tapes already indexed down to this device)
    and ``b`` is the replicated (nb·bs, nrhs) right-hand side. Shared by
    the standalone distributed solve and the fused in-mesh refinement.

    Scalable communication (the fmod/fsendx participant-list analog,
    pdgstrs.c:344-827): per level the mesh exchanges two COMPACT buffers —
    the gemm partial sums over just the level's active destination rows,
    and the owner-applied diagonal rows — instead of full-X psums.
    Diagonal inverses stay sharded by owner (linvL/uinvL from the factor);
    only the (bs, nrhs) solved rows travel."""
    nb, bs = dplan.nb, dplan.bs
    nlvl_l, nlvl_u = plan.lsol_nlvl, plan.usol_nlvl

    lg_len = dplan.lsol_gloc.shape[-1]
    ug_len = dplan.usol_gloc.shape[-1]
    ld_len = dplan.ldsol_row.shape[-1]
    ud_len = dplan.udsol_row.shape[-1]
    l_act = dplan.lsol_rows.shape[-1]      # max active rows per level
    u_act = dplan.usol_rows.shape[-1]
    l_dact = dplan.lsol_drows.shape[-1]    # max diag rows per level
    u_dact = dplan.usol_drows.shape[-1]
    lsol_rows = jnp.asarray(dplan.lsol_rows, jnp.int32)
    usol_rows = jnp.asarray(dplan.usol_rows, jnp.int32)
    lsol_drows = jnp.asarray(dplan.lsol_drows, jnp.int32)
    usol_drows = jnp.asarray(dplan.usol_drows, jnp.int32)

    sweep = _make_sweep(nb, bs, nrhs, chunk, transpose=False)

    def run(pool, linvL, uinvL, tapes, b):
        (lgp, lgl, lgs, lgd, ugp, ugl, ugs, ugd,
         ldp, ldr, ldq, ldi, udp, udr, udq, udi) = tapes
        X = b.reshape(nb, bs, nrhs)
        X = jnp.concatenate([X, jnp.zeros((1, bs, nrhs), X.dtype)], axis=0)
        X = sweep(pool, linvL, lgp, lgl, lgs, lgd, ldp, ldr, ldq, ldi,
                  X, nlvl_l, lg_len, l_act, lsol_rows, ld_len, l_dact,
                  lsol_drows)
        X = sweep(pool, uinvL, ugp, ugl, ugs, ugd, udp, udr, udq, udi,
                  X, nlvl_u, ug_len, u_act, usol_rows, ud_len, u_dact,
                  usol_drows)
        return X[:nb].reshape(nb * bs, nrhs)

    return run


def build_dist_solve_fn(plan: SymbolicPlan, dplan: DistPlan2D, grid: Grid2D,
                        nrhs: int, *, chunk: int = 16):
    """Compile the SPMD distributed triangular solves (see
    :func:`solve_sweeps_core` for the communication scheme)."""
    run = solve_sweeps_core(plan, dplan, nrhs, chunk=chunk)

    def spmd(pools, linvL, uinvL, *args):
        tapes, b = args[:-1], args[-1]
        local = tuple(t[0, 0] for t in tapes)
        return run(pools[0, 0], linvL[0, 0], uinvL[0, 0], local, b)

    sharded = P(R_AXIS, C_AXIS)
    rep = P()
    fn = shard_map(
        spmd, mesh=grid.mesh,
        in_specs=(sharded, sharded, sharded) + (sharded,) * 16 + (rep,),
        out_specs=rep, check_vma=False)

    @jax.jit
    def solve(pools, linvL, uinvL, stapes, b):
        return fn(pools, linvL, uinvL, *stapes, b)

    return solve


def make_dist_solve_tapes(dplan: DistPlan2D):
    names = ["lsol_gptr", "lsol_gloc", "lsol_gsrc", "lsol_gdst",
             "usol_gptr", "usol_gloc", "usol_gsrc", "usol_gdst",
             "ldsol_ptr", "ldsol_row", "ldsol_pos", "ldsol_inv",
             "udsol_ptr", "udsol_row", "udsol_pos", "udsol_inv"]
    return tuple(jnp.asarray(getattr(dplan, n), dtype=jnp.int32)
                 for n in names)


# ---------------------------------------------------------------------------
# sharded NRLoc input (the dReDistribute_A analog, pddistribute.c:66-433)
# ---------------------------------------------------------------------------
#
# Multi-process input pipeline that never forms global A values on
# non-zero processes: each process maps ITS local row-chunk entries
# directly to (owner device, pool offset, scaled value) using the
# broadcast transforms + the (pattern-only) symbolic plan, and one
# device-side exchange scatters them into the sharded pool. The reference
# does the same owner-computed redistribution with an MPI alltoall;
# here the exchange is an all-gather + masked scatter over the mesh.


def _proc_device_slots(grid):
    """Mesh index tuples owned by THIS process, in device order (works
    for any mesh rank — 2D and 3D grids)."""
    import jax
    devs = np.asarray(grid.mesh.devices)
    return [idx for idx in np.ndindex(devs.shape)
            if devs[idx].process_index == jax.process_index()]


def _split_to_device_slots(grid, arrays, fills, m):
    """Split this process's entry streams round-robin across its own
    device slots of a (*mesh_shape, m) host array (other slots hold fill
    — they are never read: each device's shard comes from its own
    process's callback)."""
    shape = np.asarray(grid.mesh.devices).shape
    pos = _proc_device_slots(grid)
    nloc = max(1, len(pos))
    outs = [np.full(shape + (m,), f, dtype=a.dtype)
            for a, f in zip(arrays, fills)]
    L = len(arrays[0])
    per = -(-L // nloc) if L else 0
    for i, idx in enumerate(pos):
        lo, hi = i * per, min((i + 1) * per, L)
        if lo >= hi:
            continue
        for o, a in zip(outs, arrays):
            o[idx + (slice(0, hi - lo),)] = a[lo:hi]
    return outs


def _agree_stream_len(grid, local_len: int) -> int:
    """Global max of ceil(local_len / local_device_count), bucket-padded
    (one tiny replicated-int exchange; every process must call)."""
    import jax
    from ..ops.kernels.spmv import _coo_bucket
    nloc = max(1, len(_proc_device_slots(grid)))
    need = -(-local_len // nloc)
    if jax.process_count() == 1:
        return _coo_bucket(max(need, 1))
    from jax.experimental import multihost_utils as mhu
    allv = np.asarray(mhu.process_allgather(np.array(need, np.int64)))
    return _coo_bucket(max(int(allv.max()), 1))


def gather_values_to0(grid: Grid2D, rows, cols, vals, n, dtype):
    """Device-side gather of every process's COO stream, host-materialized
    ONLY on process 0 (the preprocessing host — the pdgssvx.c:768-794
    global-gather role). Non-zero processes contribute their shard and
    never call back to host. Returns the global csc on process 0, None
    elsewhere. Padding entries carry row index n and are dropped."""
    import jax
    import scipy.sparse as sp
    m = _agree_stream_len(grid, len(rows))
    sh = _split_to_device_slots(
        grid, (np.asarray(rows, np.int64), np.asarray(cols, np.int64),
               np.asarray(vals, dtype)), (n, 0, 0), m)
    mesh = grid.mesh
    shard = NamedSharding(mesh, P(*mesh.axis_names))
    rep = NamedSharding(mesh, P())
    gl = [jax.make_array_from_callback(a.shape, shard,
                                       lambda idx, a=a: a[idx])
          for a in sh]
    out = jax.jit(lambda r, c, v: (r, c, v),
                  out_shardings=(rep, rep, rep))(*gl)
    if jax.process_index() != 0:
        return None
    r, c, v = (np.asarray(o).reshape(-1) for o in out)
    keep = r < n
    return sp.csc_matrix((v[keep], (r[keep], c[keep])), shape=(n, n))


def nrloc_slot_entries(plan: SymbolicPlan, chunks,
                       row_scale, col_scale, rowperm, colperm,
                       expand, n_e, n, *, embed=False,
                       with_identity=False):
    """Map local NRLoc entries (global row coords) to
    (pool slot, row-in-block, col-in-block, scaled value) — the
    grid-independent half of dReDistribute_A (the 2D/3D wrappers map
    slots to their grid's owners). ``with_identity`` adds the
    unit-diagonal entries of expansion/block padding (contributed by
    ONE process).

    A3[r, c] = (Dr·A·Dc)[rowperm[colperm[r]], colperm[c]], then the
    alignment expansion re = expand[r], then (for complex64 on TPU) the
    ring embedding doubling."""
    bs = plan.bs
    inv_rp = np.empty_like(rowperm)
    inv_rp[rowperm] = np.arange(len(rowperm))
    inv_cp = np.empty_like(colperm)
    inv_cp[colperm] = np.arange(len(colperm))

    from ..utils.nrloc import NRLocMatrix
    i, j, v = NRLocMatrix(chunks, n, local=True).to_coo_arrays()
    v = row_scale[i] * v * col_scale[j]
    r = inv_cp[inv_rp[i]]
    c = inv_cp[j]
    if expand is not None:
        r = np.asarray(expand)[r]
        c = np.asarray(expand)[c]
    dim = n_e if expand is not None else n

    if embed:
        # a+bi -> [[a,-b],[b,a]] at (2r, 2c)
        re, im = np.real(v), np.imag(v)
        r = np.concatenate([2 * r, 2 * r + 1, 2 * r, 2 * r + 1])
        c0 = c
        c = np.concatenate([2 * c0, 2 * c0 + 1, 2 * c0 + 1, 2 * c0])
        v = np.concatenate([re, re, -im, im])
        dim *= 2

    if with_identity:
        # expansion pads + block pads hold a decoupled unit diagonal
        n_pad = plan.nb * bs
        ident = []
        if expand is not None:
            present = np.zeros(dim, dtype=bool)
            base = np.asarray(expand)
            if embed:
                present[2 * base] = True
                present[2 * base + 1] = True
            else:
                present[base] = True
            ident.append(np.flatnonzero(~present))
        if n_pad > dim:
            ident.append(np.arange(dim, n_pad, dtype=np.int64))
        if ident:
            p = np.concatenate(ident)
            r = np.concatenate([r, p])
            c = np.concatenate([c, p])
            v = np.concatenate([v, np.ones(len(p), v.dtype)])

    # block coords -> slot: one vectorized binary search over the
    # lexicographic (col, row) slot order (slots are column-major)
    bi, bj = r // bs, c // bs
    scol = np.asarray(plan.slot_col)
    srow = np.asarray(plan.slot_row)
    keys = bj * (plan.nb + 1) + bi
    skeys = scol.astype(np.int64) * (plan.nb + 1) + srow.astype(np.int64)
    slot = np.searchsorted(skeys, keys)
    ok = (slot < len(skeys)) & (skeys[np.minimum(slot, len(skeys) - 1)]
                                == keys)
    if not np.all(ok):
        raise ValueError("NRLoc entry outside the symbolic pattern")
    return slot, r % bs, c % bs, v


def nrloc_entry_offsets(plan: SymbolicPlan, dplan: DistPlan2D, chunks,
                        row_scale, col_scale, rowperm, colperm,
                        expand, n_e, n, *, embed=False,
                        with_identity=False):
    """2D-grid owner mapping over :func:`nrloc_slot_entries`: returns
    (owner_device, flat pool offset, scaled value)."""
    bs = plan.bs
    bb = bs * bs
    slot, ri, ci, v = nrloc_slot_entries(
        plan, chunks, row_scale, col_scale, rowperm, colperm,
        expand, n_e, n, embed=embed, with_identity=with_identity)
    dev = np.asarray(dplan.owner_dev)[slot]
    off = (np.asarray(dplan.local_slot)[slot] * bb
           + ri.astype(np.int64) * bs + ci)
    return dev.astype(np.int32), off.astype(np.int64), v


def init_local_pools_nrloc(plan: SymbolicPlan, dplan: DistPlan2D,
                           grid: Grid2D, dev, off, vals, dtype):
    """Build the sharded pool from per-process entry streams: one
    device-side all-gather + masked scatter-add (the alltoall of
    dReDistribute_A recast as a mesh collective). No process ever holds
    global values on host."""
    import jax
    bs = plan.bs
    pr, pc = dplan.pr, dplan.pc
    n_local = dplan.n_local
    m = _agree_stream_len(grid, len(dev))
    sh = _split_to_device_slots(
        grid, (np.asarray(dev, np.int32), np.asarray(off, np.int64),
               np.asarray(vals, dtype)), (-1, 0, 0), m)
    mesh = grid.mesh
    shard = NamedSharding(mesh, P(R_AXIS, C_AXIS))
    gl = [jax.make_array_from_callback(a.shape, shard,
                                       lambda idx, a=a: a[idx])
          for a in sh]

    bb = bs * bs
    CH = 1 << 16   # chunked 3D-shape scatter: bounds the sort-lowering
    #                temps by the chunk and avoids the flat+reshape 2x
    #                pool materialization (same discipline as
    #                blocklu._pool_scatter_device — the capacity path)

    def spmd(d, o, v):
        d = lax.all_gather(lax.all_gather(d[0, 0], C_AXIS), R_AXIS)
        o = lax.all_gather(lax.all_gather(o[0, 0], C_AXIS), R_AXIS)
        v = lax.all_gather(lax.all_gather(v[0, 0], C_AXIS), R_AXIS)
        d, o, v = d.reshape(-1), o.reshape(-1), v.reshape(-1)
        L = d.shape[0]
        my = (lax.axis_index(R_AXIS).astype(jnp.int32) * pc
              + lax.axis_index(C_AXIS).astype(jnp.int32))
        pool = jnp.zeros((n_local, bs, bs), v.dtype)

        def body(i, pool):
            offs = i * CH + jnp.arange(CH, dtype=jnp.int32)
            valid = offs < L
            offs = jnp.minimum(offs, L - 1)
            sel = valid & (d[offs] == my)
            oc = jnp.where(sel, o[offs], 0)
            vc = jnp.where(sel, v[offs], 0)
            return pool.at[oc // bb, (oc % bb) // bs, oc % bs].add(vc)

        return _chunked(0, L, CH, body, pool)[None, None]



    fn = shard_map(spmd, mesh=mesh,
                   in_specs=(P(R_AXIS, C_AXIS),) * 3,
                   out_specs=P(R_AXIS, C_AXIS), check_vma=False)
    return jax.jit(fn)(*gl)


def make_coo_shards_nrloc(chunks, n, grid: Grid2D, dtype):
    """Per-process COO shards for the in-mesh refinement: each process's
    devices carry its local rows' entries (pdgsmv_init from local data —
    no global COO anywhere). Returns (pr, pc, m) host arrays valid at
    this process's device slots."""
    from ..utils.nrloc import NRLocMatrix
    rows, cols, vals = NRLocMatrix(chunks, n, local=True).to_coo_arrays(
        dtype)
    m = _agree_stream_len(grid, len(rows))
    sh = _split_to_device_slots(
        grid, (rows.astype(np.int32), cols.astype(np.int32), vals),
        (n, 0, 0), m)
    return tuple(sh)


# ---------------------------------------------------------------------------
# distributed transposed solves (the trans branches of pdgstrs)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DistTransPlan2D:
    """Per-device tapes for the Aᵀ solve: a forward Uᵀ level sweep then a
    backward Lᵀ sweep, both in the same compact-psum scheme as the
    forward solve (reference: the trans code paths of pdgstrs /
    pdgstrs_lsum for every precision)."""

    nlvl_u: int
    nlvl_l: int
    # Uᵀ sweep (runs first)
    ut_gptr: np.ndarray
    ut_gloc: np.ndarray
    ut_gsrc: np.ndarray
    ut_gdst: np.ndarray
    ut_rows: np.ndarray
    utd_ptr: np.ndarray
    utd_row: np.ndarray
    utd_pos: np.ndarray
    utd_inv: np.ndarray
    ut_drows: np.ndarray
    # Lᵀ sweep
    lt_gptr: np.ndarray
    lt_gloc: np.ndarray
    lt_gsrc: np.ndarray
    lt_gdst: np.ndarray
    lt_rows: np.ndarray
    ltd_ptr: np.ndarray
    ltd_row: np.ndarray
    ltd_pos: np.ndarray
    ltd_inv: np.ndarray
    lt_drows: np.ndarray


def trans_partition_plan(plan: SymbolicPlan,
                         dplan: DistPlan2D) -> DistTransPlan2D:
    """Distribute the transposed level schedules over the same grid
    (reuses the single-chip transpose schedule; the blocks' owners are
    unchanged, only the dependency direction flips)."""
    from ..ops.kernels.blocklu import _trans_schedule
    pr, pc = dplan.pr, dplan.pc
    od, ls, di = dplan.owner_dev, dplan.local_slot, dplan.dinv_idx
    gpu, gsu, gru, gdu, dpu, dgu, nlu = _trans_schedule(plan, "U")
    gpl, gsl, grl, gdl, dpl, dgl, nll = _trans_schedule(plan, "L")
    usg = _solve_pack(plan, od, ls, pr, pc, gpu, gsu, gru, gdu, nlu)
    lsg = _solve_pack(plan, od, ls, pr, pc, gpl, gsl, grl, gdl, nll)
    udg = _diag_pack(plan, od, ls, di, pr, pc, dpu, dgu, nlu)
    ldg = _diag_pack(plan, od, ls, di, pr, pc, dpl, dgl, nll)
    return DistTransPlan2D(
        nlvl_u=nlu, nlvl_l=nll,
        ut_gptr=usg[0], ut_gloc=usg[1], ut_gsrc=usg[2], ut_gdst=usg[3],
        ut_rows=usg[4],
        utd_ptr=udg[0], utd_row=udg[1], utd_pos=udg[2], utd_inv=udg[3],
        ut_drows=udg[4],
        lt_gptr=lsg[0], lt_gloc=lsg[1], lt_gsrc=lsg[2], lt_gdst=lsg[3],
        lt_rows=lsg[4],
        ltd_ptr=ldg[0], ltd_row=ldg[1], ltd_pos=ldg[2], ltd_inv=ldg[3],
        lt_drows=ldg[4],
    )


def make_dist_trans_tapes(tplan: DistTransPlan2D):
    names = ["ut_gptr", "ut_gloc", "ut_gsrc", "ut_gdst",
             "lt_gptr", "lt_gloc", "lt_gsrc", "lt_gdst",
             "utd_ptr", "utd_row", "utd_pos", "utd_inv",
             "ltd_ptr", "ltd_row", "ltd_pos", "ltd_inv"]
    return tuple(jnp.asarray(getattr(tplan, n), dtype=jnp.int32)
                 for n in names)


def trans_solve_sweeps_core(plan: SymbolicPlan, dplan: DistPlan2D,
                            tplan: DistTransPlan2D, nrhs: int, *,
                            chunk: int = 16):
    """Per-device Aᵀ sweep body, callable inside a shard_map region:
    ``run(pool, linvL, uinvL, local_trans_tapes, b)``. Uᵀ forward sweep
    with transposed upper inverses first, then the Lᵀ backward sweep."""
    nb, bs = dplan.nb, dplan.bs
    ug_len = tplan.ut_gloc.shape[-1]
    lg_len = tplan.lt_gloc.shape[-1]
    ud_len = tplan.utd_row.shape[-1]
    ld_len = tplan.ltd_row.shape[-1]
    u_act = tplan.ut_rows.shape[-1]
    l_act = tplan.lt_rows.shape[-1]
    u_dact = tplan.ut_drows.shape[-1]
    l_dact = tplan.lt_drows.shape[-1]
    ut_rows = jnp.asarray(tplan.ut_rows, jnp.int32)
    lt_rows = jnp.asarray(tplan.lt_rows, jnp.int32)
    ut_drows = jnp.asarray(tplan.ut_drows, jnp.int32)
    lt_drows = jnp.asarray(tplan.lt_drows, jnp.int32)

    sweep = _make_sweep(nb, bs, nrhs, chunk, transpose=True)

    def run(pool, linvL, uinvL, tapes, b):
        (ugp, ugl, ugs, ugd, lgp, lgl, lgs, lgd,
         udp, udr, udq, udi, ldp, ldr, ldq, ldi) = tapes
        X = b.reshape(nb, bs, nrhs)
        X = jnp.concatenate([X, jnp.zeros((1, bs, nrhs), X.dtype)], axis=0)
        X = sweep(pool, uinvL, ugp, ugl, ugs, ugd, udp, udr, udq, udi,
                  X, tplan.nlvl_u, ug_len, u_act, ut_rows, ud_len, u_dact,
                  ut_drows)
        X = sweep(pool, linvL, lgp, lgl, lgs, lgd, ldp, ldr, ldq, ldi,
                  X, tplan.nlvl_l, lg_len, l_act, lt_rows, ld_len, l_dact,
                  lt_drows)
        return X[:nb].reshape(nb * bs, nrhs)

    return run


def build_dist_trans_solve_fn(plan: SymbolicPlan, dplan: DistPlan2D,
                              tplan: DistTransPlan2D, grid: Grid2D,
                              nrhs: int, *, chunk: int = 16):
    """Compile the SPMD distributed Aᵀ solve (same collective scheme as
    :func:`build_dist_solve_fn`)."""
    run = trans_solve_sweeps_core(plan, dplan, tplan, nrhs, chunk=chunk)

    def spmd(pools, linvL, uinvL, *args):
        tapes, b = args[:-1], args[-1]
        local = tuple(t[0, 0] for t in tapes)
        return run(pools[0, 0], linvL[0, 0], uinvL[0, 0], local, b)

    sharded = P(R_AXIS, C_AXIS)
    rep = P()
    fn = shard_map(
        spmd, mesh=grid.mesh,
        in_specs=(sharded, sharded, sharded) + (sharded,) * 16 + (rep,),
        out_specs=rep, check_vma=False)

    @jax.jit
    def solve(pools, linvL, uinvL, ttapes, b):
        return fn(pools, linvL, uinvL, *ttapes, b)

    return solve


# ---------------------------------------------------------------------------
# distributed SpMV + in-mesh iterative refinement
# ---------------------------------------------------------------------------
#
# The reference builds a communication plan so refinement residuals are
# computed in place on the distributed matrix (pdgsmv_init/pdgsmv,
# reference: SRC/double/pdgsmv.c:1-383) and runs the berr loop against it
# (pdgsrfs.c:129-251). The TPU recast: COO entries of the ORIGINAL A are
# partitioned evenly over the mesh devices; each device segment-sums its
# partial products and one two-axis psum replicates the full product — the
# owner-partition + alltoall of pdgsmv becomes partition + allreduce over
# ICI, consistent with the solve design where X is replicated.


def _pad_coo_streams(coo, n, ndev, value_streams):
    """Shared pdgsmv_init scaffolding: bucket the per-device stream
    length (shape-canonical across matrices — persistent-cache
    friendly), pad with trash-row entries, reshape to (ndev, m)."""
    from ..ops.kernels.spmv import _coo_bucket
    nnz = coo.nnz
    m = _coo_bucket(-(-max(nnz, 1) // ndev))
    rows = np.full(ndev * m, n, dtype=np.int32)
    cols = np.zeros(ndev * m, dtype=np.int32)
    rows[:nnz] = coo.row
    cols[:nnz] = coo.col
    outs = [rows.reshape(ndev, m), cols.reshape(ndev, m)]
    for data, dtype in value_streams:
        v = np.zeros(ndev * m, dtype=dtype)
        v[:nnz] = data.astype(dtype)
        outs.append(v.reshape(ndev, m))
    return tuple(outs)


def make_coo_shards(A, ndev: int, dtype):
    """Partition the COO of ``A`` into ``ndev`` equal entry chunks
    (pdgsmv_init analog). Returns (rows, cols, vals) of shape (ndev, m);
    padding entries target the trash row ``n`` with value 0."""
    import scipy.sparse as sp
    coo = sp.coo_matrix(A)
    return _pad_coo_streams(coo, A.shape[0], ndev, [(coo.data, dtype)])


def make_coo_shards_planar(A, ndev: int, real_dtype):
    """COO entry shards with planar (re, im) values — the pdgsmv_init
    analog for the ring-embedded complex path (TPU devices hold no
    complex dtype). Returns (rows, cols, vr, vi) of shape (ndev, m)."""
    import scipy.sparse as sp
    coo = sp.coo_matrix(A)
    return _pad_coo_streams(coo, A.shape[0], ndev,
                            [(coo.data.real, real_dtype),
                             (coo.data.imag, real_dtype)])


def dist_spmv_planar(rl, cl, vr, vi, x2, n):
    """Planar complex per-device partial SpMV + two-axis psum inside
    shard_map: ``x2`` is the replicated (2, n, k) planes; returns
    replicated planes of A·x."""
    k = x2.shape[-1]
    xr, xi = x2[0][cl], x2[1][cl]
    pr_ = jnp.zeros((n + 1, k), x2.dtype).at[rl].add(
        vr[:, None] * xr - vi[:, None] * xi)
    pi_ = jnp.zeros((n + 1, k), x2.dtype).at[rl].add(
        vr[:, None] * xi + vi[:, None] * xr)
    out = jnp.stack([pr_[:n], pi_[:n]])
    return lax.psum(lax.psum(out, R_AXIS), C_AXIS)


def dist_spmv(rl, cl, vl, x, n):
    """Per-device partial SpMV + two-axis psum, callable inside shard_map:
    ``x`` is the replicated (n, k) multiplicand; returns replicated A·x."""
    part = jnp.zeros((n + 1, x.shape[1]), x.dtype)
    part = part.at[rl].add(vl[:, None] * x[cl])
    return lax.psum(lax.psum(part, R_AXIS), C_AXIS)[:n]


def build_dist_spmv_fn(A, grid: Grid2D, nrhs: int, dtype):
    """Standalone compiled distributed SpMV (pdgsmv analog): COO shards
    live sharded on the mesh; b and the product are replicated."""
    n = A.shape[0]
    rows, cols, vals = make_coo_shards(A, grid.nprow * grid.npcol, dtype)
    pr, pc = grid.nprow, grid.npcol
    sh3 = (pr, pc, rows.shape[-1])
    shards = tuple(jnp.asarray(a.reshape(sh3)) for a in (rows, cols, vals))
    sharded, rep = P(R_AXIS, C_AXIS), P()

    def spmd(rl, cl, vl, x):
        return dist_spmv(rl[0, 0], cl[0, 0], vl[0, 0], x, n)

    fn = shard_map(spmd, mesh=grid.mesh,
                   in_specs=(sharded,) * 3 + (rep,), out_specs=rep,
                   check_vma=False)

    @jax.jit
    def spmv(x):
        return fn(*shards, x)

    return spmv
