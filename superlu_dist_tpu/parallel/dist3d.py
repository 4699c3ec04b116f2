"""3D communication-avoiding distributed factorization (pdgstrf3d analog).

The reference's 3D algorithm (reference: SRC/double/pdgstrf3d.c:121-439,
supernodalForest.c getForests, pd3dcomm.c dreduceAllAncestors3d): partition
the elimination forest into Pz independent subtree groups plus a shared
ancestor "top"; each z-layer factors its subtrees on its own 2D grid with
ancestor blocks replicated; the replicated partial Schur updates are summed
across z; the top is then factored redundantly by every layer. The
communication win: subtree factorization needs no cross-layer traffic at
all — one ancestor reduction replaces per-step broadcasts.

TPU-native realization:
- forest partition = greedy load-balanced bin packing of maximal subtrees
  hanging off the ancestor-closed heavy top (the SUPERLU_LBS greedy
  strategy, supernodalForest.c:833-922), with a gemm-tape validation pass
  that promotes any step violating subtree independence;
- the z dimension is a mesh axis: ancestor replicas live at identical local
  slots on every layer ([2, 2+max_anc) of each device pool), so
  ``dreduceAllAncestors3d`` is literally ``psum(pool[2:2+max_anc], 'z')``;
- phase-1 levels use only within-layer ('r','c') psums; phase-2 (top)
  levels run replicated on all layers.
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
from .grid import C_AXIS, R_AXIS, Z_AXIS, Grid3D

_ZERO = 0
_TRASH = 1
_RESERVED = 2


def step_costs(plan: SymbolicPlan) -> np.ndarray:
    """Block-op cost model per elimination step (for load balancing)."""
    cost = np.ones(plan.nb, dtype=np.float64)
    cost += np.diff(plan.l_ptr) + np.diff(plan.u_ptr)
    cost += 2.0 * np.diff(plan.g_ptr)
    return cost


def partition_forest(plan: SymbolicPlan, pz: int):
    """Assign elimination steps to z-layers.

    Returns ``step_layer`` (nb,) with -1 for the shared ancestor top.
    The top is ancestor-closed; subtree independence is validated against
    the gemm tape and violators promoted into the top.
    """
    nb = plan.nb
    parent = plan.block_parent
    cost = step_costs(plan)
    total = float(cost.sum())

    # children have smaller index than parents in an etree (parent > k), so
    # ascending order accumulates subtree costs correctly
    sub = cost.copy()
    for k in range(nb):
        p = parent[k]
        if p >= 0:
            sub[p] += sub[k]

    if pz <= 1:
        return np.zeros(nb, dtype=np.int64)

    in_top = sub > (total / pz)
    # ancestor closure (monotone by construction; enforce anyway)
    for k in range(nb - 1, -1, -1):
        p = parent[k]
        if p >= 0 and in_top[k]:
            in_top[p] = True

    def promote(k):
        while k >= 0 and not in_top[k]:
            in_top[k] = True
            k = parent[k]

    # children lists (for peeling large subtrees)
    children = [[] for _ in range(nb)]
    for k in range(nb):
        if parent[k] >= 0:
            children[parent[k]].append(k)

    # maximal subtrees below the top → greedy balance into pz bins
    step_layer = np.full(nb, -1, dtype=np.int64)
    for _ in range(nb):  # fixpoint loop (promotions shrink subtrees)
        roots = [k for k in range(nb)
                 if not in_top[k] and (parent[k] < 0 or in_top[parent[k]])]
        # peel the heaviest subtree until enough independent roots exist
        # (the getForests level-descent: more levels → more, smaller trees)
        guard = 0
        while len(roots) < pz and roots and guard < nb:
            guard += 1
            r = max(roots, key=lambda q: sub[q])
            kids = [c for c in children[r] if not in_top[c]]
            if not kids and len(roots) == 1:
                break
            in_top[r] = True
            roots.remove(r)
            roots.extend(kids)
            if not kids and not roots:
                break
        # subtree membership: parents have larger indices, so a single
        # descending pass propagates each root's id down its subtree
        comp = np.full(nb, -1, dtype=np.int64)
        for r in roots:
            comp[r] = r
        for k in range(nb - 1, -1, -1):
            if in_top[k] or comp[k] >= 0:
                continue
            p = parent[k]
            if p >= 0 and comp[p] >= 0:
                comp[k] = comp[p]

        bin_cost = np.zeros(pz)
        bin_of = {}
        for r in sorted(roots, key=lambda r: -sub[r]):
            b = int(np.argmin(bin_cost))
            bin_of[r] = b
            bin_cost[b] += sub[r]
        step_layer[:] = -1
        for k in range(nb):
            if not in_top[k] and comp[k] >= 0:
                step_layer[k] = bin_of[comp[k]]

        # validate subtree independence against the gemm tape: any update
        # crossing layers (or from the top into a layer) promotes its target
        slot_step = plan.slot_step
        bad = []
        for k in range(nb):
            for t in range(plan.g_ptr[k], plan.g_ptr[k + 1]):
                a = int(slot_step[plan.g_t[t]])
                if step_layer[a] >= 0 and step_layer[a] != step_layer[k]:
                    bad.append(a)
        if not bad:
            break
        for a in bad:
            promote(a)
    return step_layer


@dataclasses.dataclass
class DistPlan3D:
    pz: int
    pr: int
    pc: int
    nb: int
    bs: int
    n_local: int
    max_anc: int          # ancestor slots per device: locals [2, 2+max_anc)
    max_p1: int           # phase-1 level count (padded across layers)
    ntop: int             # phase-2 (top) level count
    max_lbuf: int
    max_ubuf: int
    step_layer: np.ndarray

    # placement (for init + gather): global slot -> (2D device, local, anc?)
    slot_rc: np.ndarray
    slot_local: np.ndarray
    slot_is_anc: np.ndarray

    # factor tapes (pz, pr, pc, ...), levels = phase1 ++ top
    dptr: np.ndarray
    dstep: np.ndarray
    dloc: np.ndarray
    dpil: np.ndarray        # position of the step within its level
    max_dlvl: int           # compact inverse-broadcast buffer rows
    lptr: np.ndarray
    lloc: np.ndarray
    lpos: np.ndarray
    lstep: np.ndarray
    lpil: np.ndarray
    uptr: np.ndarray
    uloc: np.ndarray
    upos: np.ndarray
    ustep: np.ndarray
    upil: np.ndarray
    gptr: np.ndarray
    glpos: np.ndarray
    gupos: np.ndarray
    gtloc: np.ndarray

    # solve tapes (pz, pr, pc, ...)
    lsol_gptr: np.ndarray
    lsol_gloc: np.ndarray
    lsol_gsrc: np.ndarray
    lsol_gdst: np.ndarray
    usol_gptr: np.ndarray
    usol_gloc: np.ndarray
    usol_gsrc: np.ndarray
    usol_gdst: np.ndarray

    # anc25d analog (reference: CplusplusFactor/anc25d.hpp, env ANC25D):
    # "zsplit" divides the top (ancestor) levels' Schur gemms across the
    # z layers instead of computing them redundantly on every layer —
    # gemm flops/layer drop ~pz-fold at the cost of one z-psum of the
    # level's touched ancestor blocks. Tapes present only in that mode.
    anc25d: str = "replicated"
    t2ptr: np.ndarray = None      # (pz, pr, pc, nlvl+1) scatter ranges
    t2loc: np.ndarray = None      # local slots in compact-position order
    max_tact: int = 0             # max touched ancestor blocks per level

    # ---- comm accounting (bytes per psum; the SCT comm-volume role) ----
    def comm_volume(self, itemsize: int, nrhs: int = 1) -> dict:
        """Collective payload of the compiled 3D program: per-level
        inverse/panel psums over r,c; the one ancestor z-reduction
        (dreduceAllAncestors3d analog); optional anc25d z-psums; solve
        X-sized psums over all axes per level."""
        bsb = self.bs * self.bs * itemsize
        nlvl = self.max_p1 + self.ntop
        fac = nlvl * (2 * (self.max_dlvl + 1)
                      + (self.max_lbuf + 2) + (self.max_ubuf + 2)) * bsb
        anc = self.max_anc * bsb            # the z ancestor reduction
        if self.anc25d == "zsplit":
            anc += self.ntop * (self.max_tact + 1) * bsb
        xrow = self.bs * nrhs * itemsize
        snlvl = (self.lsol_gptr.shape[-1] - 1
                 + self.usol_gptr.shape[-1] - 1)
        sol = snlvl * (self.nb + 1) * xrow      # full-X psum per level
        return {"factor_psum_bytes": int(fac),
                "anc_reduce_bytes": int(anc),
                "solve_psum_bytes": int(sol)}


def _compact_levels(steps, global_level):
    """Group ``steps`` by their global level, compacted to consecutive."""
    if len(steps) == 0:
        return []
    lvls = sorted(set(int(global_level[k]) for k in steps))
    remap = {lv: i for i, lv in enumerate(lvls)}
    out = [[] for _ in lvls]
    for k in sorted(steps):
        out[remap[int(global_level[k])]].append(int(k))
    return out


def _solve_pack3d(nb, pz, pr, pc, slot_is_anc, slot_layer, slot_rc,
                  slot_local, gptr_g, gslot_g, gsrc_g, gdst_g, snlvl):
    """Group one sweep's gemms by (layer, 2D device, level). Ancestor
    slots are worked on layer 0 only (their replicas are identical after
    the z reduction — counting them once keeps the psum exact)."""
    ndev2 = pr * pc
    lists = [[[[] for _ in range(snlvl)] for _ in range(ndev2)]
             for _ in range(pz)]
    for l in range(snlvl):
        for t in range(gptr_g[l], gptr_g[l + 1]):
            s = gslot_g[t]
            z = 0 if slot_is_anc[s] else int(slot_layer[s])
            lists[z][slot_rc[s]][l].append(
                (int(slot_local[s]), int(gsrc_g[t]), int(gdst_g[t])))
    ptrs = np.zeros((pz, ndev2, snlvl + 1), dtype=np.int64)
    maxlen = 1
    for z in range(pz):
        for d in range(ndev2):
            for l in range(snlvl):
                ptrs[z, d, l + 1] = ptrs[z, d, l] + len(lists[z][d][l])
        maxlen = max(maxlen, int(ptrs[z, :, -1].max()))
    loc = np.full((pz, ndev2, maxlen), _ZERO, dtype=np.int32)
    src = np.zeros((pz, ndev2, maxlen), dtype=np.int32)
    dst = np.full((pz, ndev2, maxlen), nb, dtype=np.int32)
    for z in range(pz):
        for d in range(ndev2):
            pos = 0
            for l in range(snlvl):
                for (a, b, c) in lists[z][d][l]:
                    loc[z, d, pos] = a
                    src[z, d, pos] = b
                    dst[z, d, pos] = c
                    pos += 1
    return (ptrs.reshape(pz, pr, pc, snlvl + 1).astype(np.int32),
            loc.reshape(pz, pr, pc, maxlen),
            src.reshape(pz, pr, pc, maxlen),
            dst.reshape(pz, pr, pc, maxlen))


def partition_plan3d(plan: SymbolicPlan, pz: int, pr: int, pc: int,
                     anc25d: str = "replicated") -> DistPlan3D:
    nb = plan.nb
    zsplit = anc25d == "zsplit"
    srow, scol = plan.slot_row, plan.slot_col
    step_layer = partition_forest(plan, pz)
    slot_step = plan.slot_step
    slot_layer = step_layer[slot_step]            # -1 = ancestor slot
    slot_is_anc = slot_layer < 0
    slot_rc = (srow % pr) * pc + (scol % pc)
    ndev2 = pr * pc

    # local numbering: ancestors first (identical across z), then layer slots
    slot_local = np.zeros(plan.nslots, dtype=np.int64)
    anc_count = np.zeros(ndev2, dtype=np.int64)
    for s in np.flatnonzero(slot_is_anc):
        d = slot_rc[s]
        slot_local[s] = _RESERVED + anc_count[d]
        anc_count[d] += 1
    max_anc = int(anc_count.max()) if ndev2 else 0
    lay_count = np.zeros((pz, ndev2), dtype=np.int64)
    for s in np.flatnonzero(~slot_is_anc):
        d = slot_rc[s]
        z = slot_layer[s]
        slot_local[s] = _RESERVED + max_anc + lay_count[z, d]
        lay_count[z, d] += 1
    n_local = _RESERVED + max_anc + (int(lay_count.max()) if lay_count.size
                                     else 0)

    # schedules
    layer_scheds = [_compact_levels(np.flatnonzero(step_layer == z),
                                    plan.step_level) for z in range(pz)]
    max_p1 = max((len(s) for s in layer_scheds), default=0)
    top_sched = _compact_levels(np.flatnonzero(step_layer < 0),
                                plan.step_level)
    ntop = len(top_sched)
    nlvl = max_p1 + ntop

    # ---- per-z tape building over the combined schedule ----
    tape_lists = []   # per z: dict of lists
    max_lbuf = 1
    max_ubuf = 1
    # zsplit bookkeeping: compact positions of touched ancestor targets
    # per (device, top level) — rebuilt identically on every z pass
    # (same deterministic iteration), kept from the last pass for the
    # scatter tapes
    tpos_of: dict = {}
    for z in range(pz):
        sched = (layer_scheds[z] + [[] for _ in
                                    range(max_p1 - len(layer_scheds[z]))]
                 + top_sched)
        d_l = [[[] for _ in range(nlvl)] for _ in range(ndev2)]
        l_l = [[[] for _ in range(nlvl)] for _ in range(ndev2)]
        u_l = [[[] for _ in range(nlvl)] for _ in range(ndev2)]
        g_l = [[[] for _ in range(nlvl)] for _ in range(ndev2)]
        for l, steps in enumerate(sched):
            lrow_count = np.zeros(pr, dtype=np.int64)
            ucol_count = np.zeros(pc, dtype=np.int64)
            lpos_of = {}
            upos_of = {}
            pil_of = {int(k): i for i, k in enumerate(steps)}
            for k in steps:
                ds = plan.diag_slot[k]
                d_l[slot_rc[ds]][l].append((int(k), int(slot_local[ds]),
                                            pil_of[int(k)]))
                for s in plan.l_slots[plan.l_ptr[k]:plan.l_ptr[k + 1]]:
                    r = int(srow[s] % pr)
                    pos = int(lrow_count[r])
                    lrow_count[r] += 1
                    lpos_of[int(s)] = pos
                    l_l[slot_rc[s]][l].append(
                        (int(slot_local[s]), pos, int(k),
                         pil_of[int(k)]))
                for s in plan.u_slots[plan.u_ptr[k]:plan.u_ptr[k + 1]]:
                    c = int(scol[s] % pc)
                    pos = int(ucol_count[c])
                    ucol_count[c] += 1
                    upos_of[int(s)] = pos
                    u_l[slot_rc[s]][l].append(
                        (int(slot_local[s]), pos, int(k),
                         pil_of[int(k)]))
            max_lbuf = max(max_lbuf, int(lrow_count.max(initial=0)))
            max_ubuf = max(max_ubuf, int(ucol_count.max(initial=0)))
            if zsplit and l >= max_p1:
                # anc25d zsplit: round-robin the level's gemms over z,
                # destinations remapped to compact per-level positions
                # (the delta buffer the z-psum reduces)
                if z == 0:
                    for d in range(ndev2):
                        tpos_of[(d, l)] = {}
                zcnt = np.zeros(ndev2, dtype=np.int64)
                for k in steps:
                    for t in range(plan.g_ptr[k], plan.g_ptr[k + 1]):
                        tgt = int(plan.g_t[t])
                        d = int(slot_rc[tgt])
                        pos_map = tpos_of[(d, l)]
                        p = pos_map.setdefault(tgt, len(pos_map))
                        if zcnt[d] % pz == z:
                            g_l[d][l].append(
                                (lpos_of[int(plan.g_l[t])],
                                 upos_of[int(plan.g_u[t])], p))
                        zcnt[d] += 1
            else:
                for k in steps:
                    for t in range(plan.g_ptr[k], plan.g_ptr[k + 1]):
                        tgt = plan.g_t[t]
                        g_l[slot_rc[tgt]][l].append(
                            (lpos_of[int(plan.g_l[t])],
                             upos_of[int(plan.g_u[t])],
                             int(slot_local[tgt])))
        tape_lists.append((d_l, l_l, u_l, g_l))

    def pack(z_lists, idx, nfields, fills):
        maxlen = 1
        ptrs = np.zeros((pz, ndev2, nlvl + 1), dtype=np.int64)
        for z in range(pz):
            lists = z_lists[z][idx]
            for d in range(ndev2):
                for l in range(nlvl):
                    ptrs[z, d, l + 1] = ptrs[z, d, l] + len(lists[d][l])
            maxlen = max(maxlen, int(ptrs[z, :, -1].max()))
        out = [np.full((pz, ndev2, maxlen), fills[f], dtype=np.int32)
               for f in range(nfields)]
        for z in range(pz):
            lists = z_lists[z][idx]
            for d in range(ndev2):
                pos = 0
                for l in range(nlvl):
                    for item in lists[d][l]:
                        for f in range(nfields):
                            out[f][z, d, pos] = item[f]
                        pos += 1
        ptrs = ptrs.reshape(pz, pr, pc, nlvl + 1).astype(np.int32)
        return ptrs, [o.reshape(pz, pr, pc, maxlen) for o in out]

    # compact inverse-broadcast positions (position-in-level): comm per
    # level is proportional to the level's steps, not nb
    max_dlvl = max(1, max((len(steps) for z in range(pz)
                           for steps in (layer_scheds[z] + top_sched)),
                          default=1))
    max_tact = max((len(v) for v in tpos_of.values()), default=0) \
        if zsplit else 0
    dptr, (dstep, dloc, dpil) = pack(tape_lists, 0, 3,
                                     [nb, _TRASH, max_dlvl])
    lptr, (lloc, lpos, lstep, lpil) = pack(tape_lists, 1, 4,
                                           [_TRASH, 0, nb, max_dlvl])
    uptr, (uloc, upos, ustep, upil) = pack(tape_lists, 2, 4,
                                           [_TRASH, 0, nb, max_dlvl])
    gptr, (glpos, gupos, gtloc) = pack(
        tape_lists, 3, 3, [0, 0, max_tact if zsplit else _TRASH])

    # ---- zsplit scatter tapes: per (device, top level) the touched
    # ancestor slots in compact-position order (replicated across z —
    # every layer applies the SAME summed delta, keeping replicas
    # synchronized for the next level's panels) ----
    t2ptr = t2loc = None
    if zsplit:
        ptr1 = np.zeros((ndev2, nlvl + 1), dtype=np.int64)
        for d in range(ndev2):
            for l in range(nlvl):
                ptr1[d, l + 1] = ptr1[d, l] + len(tpos_of.get((d, l), {}))
        t2len = max(1, int(ptr1[:, -1].max()))
        loc1 = np.full((ndev2, t2len), _TRASH, dtype=np.int32)
        for d in range(ndev2):
            p0 = 0
            for l in range(nlvl):
                for tgt in tpos_of.get((d, l), {}):
                    loc1[d, p0] = slot_local[tgt]
                    p0 += 1
        t2ptr = np.broadcast_to(
            ptr1.reshape(1, pr, pc, nlvl + 1),
            (pz, pr, pc, nlvl + 1)).astype(np.int32).copy()
        t2loc = np.broadcast_to(
            loc1.reshape(1, pr, pc, t2len),
            (pz, pr, pc, t2len)).astype(np.int32).copy()

    # ---- solve tapes: layer-slot work on its layer, ancestor work on z=0 --
    lsg = _solve_pack3d(nb, pz, pr, pc, slot_is_anc, slot_layer, slot_rc,
                        slot_local, plan.lsol_gptr, plan.lsol_gslot,
                        plan.lsol_gsrc, plan.lsol_gdst, plan.lsol_nlvl)
    usg = _solve_pack3d(nb, pz, pr, pc, slot_is_anc, slot_layer, slot_rc,
                        slot_local, plan.usol_gptr, plan.usol_gslot,
                        plan.usol_gsrc, plan.usol_gdst, plan.usol_nlvl)

    return DistPlan3D(
        pz=pz, pr=pr, pc=pc, nb=nb, bs=plan.bs, n_local=n_local,
        max_anc=max_anc, max_p1=max_p1, ntop=ntop,
        max_lbuf=max_lbuf, max_ubuf=max_ubuf, step_layer=step_layer,
        slot_rc=slot_rc, slot_local=slot_local, slot_is_anc=slot_is_anc,
        dptr=dptr, dstep=dstep, dloc=dloc, dpil=dpil, max_dlvl=max_dlvl,
        lptr=lptr, lloc=lloc, lpos=lpos, lstep=lstep, lpil=lpil,
        uptr=uptr, uloc=uloc, upos=upos, ustep=ustep, upil=upil,
        gptr=gptr, glpos=glpos, gupos=gupos, gtloc=gtloc,
        lsol_gptr=lsg[0], lsol_gloc=lsg[1], lsol_gsrc=lsg[2],
        lsol_gdst=lsg[3],
        usol_gptr=usg[0], usol_gloc=usg[1], usol_gsrc=usg[2],
        usol_gdst=usg[3],
        anc25d=anc25d, t2ptr=t2ptr, t2loc=t2loc, max_tact=max_tact,
    )


def init_local_pools3d(plan: SymbolicPlan, dplan: DistPlan3D, A3, dtype,
                       grid: Grid3D) -> jax.Array:
    """(pz, pr, pc, n_local, B, B) sharded pool. Ancestor replicas get A's
    values only on layer 0 (dGatherNRformat_loc3d convention: the reduction
    then counts them exactly once)."""
    import scipy.sparse as sp
    A3 = sp.csc_matrix(A3)
    bs = plan.bs
    bb = bs * bs
    gslot = plan.init_idx // bb
    rem = plan.init_idx % bb
    vals = np.concatenate([A3.data.astype(dtype),
                           np.ones(plan.init_ones, dtype=dtype)])
    z_of = np.where(dplan.slot_is_anc[gslot], 0,
                    dplan.step_layer[plan.slot_step[gslot]])
    # owner-computed per-shard scatter (dReDistribute_A analog): peak host
    # memory is one device's shard, never the global pool array
    dev = (z_of * (dplan.pr * dplan.pc) + dplan.slot_rc[gslot]).astype(
        np.int64)
    off = dplan.slot_local[gslot] * bb + rem
    order = np.argsort(dev, kind="stable")
    dev_s, off_s, val_s = dev[order], off[order], vals[order]
    ndev = dplan.pz * dplan.pr * dplan.pc
    dptr = np.searchsorted(dev_s, np.arange(ndev + 1))

    def make_shard(index):
        z = index[0].start or 0
        r = index[1].start or 0
        c = index[2].start or 0
        d = (z * dplan.pr + r) * dplan.pc + c
        flat = np.zeros(dplan.n_local * bb, dtype=dtype)
        lo, hi = dptr[d], dptr[d + 1]
        np.add.at(flat, off_s[lo:hi], val_s[lo:hi])
        return flat.reshape(1, 1, 1, dplan.n_local, bs, bs)

    sharding = NamedSharding(grid.mesh, P(Z_AXIS, R_AXIS, C_AXIS))
    return jax.make_array_from_callback(
        (dplan.pz, dplan.pr, dplan.pc, dplan.n_local, bs, bs), sharding,
        make_shard)


def _chunked(lo, hi, chunk, body, carry):
    nch = (hi - lo + chunk - 1) // chunk
    return lax.fori_loop(0, nch, body, carry)


def build_dist3d_factor_fn(plan: SymbolicPlan, dplan: DistPlan3D,
                           grid: Grid3D, *, chunk: int = 16,
                           diag_chunk: int = 4, prefix: bool = False):
    """Compile the SPMD 3D factorization: per-layer subtree levels →
    ancestor psum over 'z' → replicated top levels."""
    nb, bs = dplan.nb, dplan.bs
    LBUF, UBUF = dplan.max_lbuf, dplan.max_ubuf
    max_p1, ntop = dplan.max_p1, dplan.ntop
    max_anc = dplan.max_anc
    mesh = grid.mesh
    dlen = dplan.dstep.shape[-1]
    llen = dplan.lloc.shape[-1]
    ulen = dplan.uloc.shape[-1]
    glen = dplan.glpos.shape[-1]
    blu = jax.vmap(block_lu_inv, in_axes=(0, None))

    DL = dplan.max_dlvl

    zsplit = dplan.anc25d == "zsplit" and ntop > 0
    TACT = dplan.max_tact
    t2len = dplan.t2loc.shape[-1] if zsplit else 1

    def spmd(pools, thresh, lmax, *T):
        pool = pools[0, 0, 0]
        (dptr, dstep, dloc, dpil, lptr, lloc, lpos, lpil, uptr, uloc,
         upos, upil, gptr, glpos, gupos, gtloc) = (
            x[0, 0, 0] for x in T[:16])
        if zsplit:
            t2ptr, t2loc = (x[0, 0, 0] for x in T[16:18])
        dtype = pool.dtype

        def make_level(split):
            return lambda l, carry: level_body(l, carry, split)

        def level_body(l, carry, split):
            pool, linv, uinv, tiny = carry
            lo, hi = dptr[l], dptr[l + 1]
            # compact per-level inverse broadcast (comm ∝ level steps,
            # not nb — the fused U-diag/L-diag Isend analog); the full
            # linv/uinv tables accumulate LOCALLY (the z-psum at the
            # phase boundary merges the layers)
            ldelta = jnp.zeros((DL + 1, bs, bs), dtype)
            udelta = jnp.zeros((DL + 1, bs, bs), dtype)

            def diag(c, carry):
                pool, linv, uinv, ldelta, udelta, tiny = carry
                offs = lo + c * diag_chunk + jnp.arange(diag_chunk,
                                                        dtype=jnp.int32)
                valid = offs < hi
                offs = jnp.minimum(offs, dlen - 1)
                steps = jnp.where(valid, dstep[offs], nb)
                pil = jnp.where(valid, dpil[offs], DL)
                dsl = jnp.where(valid, dloc[offs], _ZERO)
                LU, lk, uk, nt = blu(pool[dsl], thresh)
                pool = pool.at[jnp.where(valid, dsl, _TRASH)].set(LU)
                lkm = jnp.where(valid[:, None, None], lk, 0)
                ukm = jnp.where(valid[:, None, None], uk, 0)
                ldelta = ldelta.at[pil].set(lkm)
                udelta = udelta.at[pil].set(ukm)
                linv = linv.at[steps].set(lkm)
                uinv = uinv.at[steps].set(ukm)
                tiny = tiny + jnp.sum(nt * valid).astype(jnp.int32)
                return pool, linv, uinv, ldelta, udelta, tiny

            pool, linv, uinv, ldelta, udelta, tiny = _chunked(
                lo, hi, diag_chunk, diag,
                (pool, linv, uinv, ldelta, udelta, tiny))
            pack = lax.psum(lax.psum(jnp.stack([ldelta, udelta]), R_AXIS),
                            C_AXIS)
            lC = pack[0]
            uC = pack[1]

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
                return pool.at[si].set(Y), lbuf.at[pos].set(Y)

            pool, lbuf = _chunked(llo, lhi, chunk, ltrsm, (pool, lbuf))

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
                return pool.at[si].set(Y), ubuf.at[pos].set(Y)

            pool, ubuf = _chunked(ulo, uhi, chunk, utrsm, (pool, ubuf))

            lbuf = lax.psum(lbuf, C_AXIS)
            ubuf = lax.psum(ubuf, R_AXIS)

            go, gh = gptr[l], gptr[l + 1]

            if not split:
                def gemm(c, pool):
                    offs = go + c * chunk + jnp.arange(chunk,
                                                       dtype=jnp.int32)
                    valid = offs < gh
                    offs = jnp.minimum(offs, glen - 1)
                    li = jnp.where(valid, glpos[offs], LBUF + 1)
                    ui = jnp.where(valid, gupos[offs], UBUF + 1)
                    ti = jnp.where(valid, gtloc[offs], _TRASH)
                    Pm = jnp.einsum("cij,cjk->cik", lbuf[li], ubuf[ui],
                                    preferred_element_type=dtype,
                                    precision=MATMUL_PRECISION)
                    return pool.at[ti].add(-Pm)

                pool = _chunked(go, gh, chunk, gemm, pool)
            else:
                # anc25d zsplit: this layer's gemm share into a compact
                # delta, z-psum, every layer applies the summed update
                # (replicas stay synchronized for the next level)
                def gemm2(c, delta):
                    offs = go + c * chunk + jnp.arange(chunk,
                                                       dtype=jnp.int32)
                    valid = offs < gh
                    offs = jnp.minimum(offs, glen - 1)
                    li = jnp.where(valid, glpos[offs], LBUF + 1)
                    ui = jnp.where(valid, gupos[offs], UBUF + 1)
                    ti = jnp.where(valid, gtloc[offs], TACT)
                    Pm = jnp.einsum("cij,cjk->cik", lbuf[li], ubuf[ui],
                                    preferred_element_type=dtype,
                                    precision=MATMUL_PRECISION)
                    return delta.at[ti].add(-Pm)

                delta = _chunked(go, gh, chunk, gemm2,
                                 jnp.zeros((TACT + 1, bs, bs), dtype))
                delta = lax.psum(delta, Z_AXIS)
                to, th = t2ptr[l], t2ptr[l + 1]

                def tapply(c, pool):
                    offs = to + c * chunk + jnp.arange(chunk,
                                                       dtype=jnp.int32)
                    valid = offs < th
                    offs = jnp.minimum(offs, t2len - 1)
                    si = jnp.where(valid, t2loc[offs], _TRASH)
                    pi = jnp.where(valid, offs - to, TACT)
                    return pool.at[si].add(delta[pi])

                pool = _chunked(to, th, chunk, tapply, pool)
            return pool, linv, uinv, tiny

        level = make_level(False)
        linv0 = jnp.zeros((nb + 1, bs, bs), dtype)
        uinv0 = jnp.zeros((nb + 1, bs, bs), dtype)
        # phase 1: independent subtrees, within-layer collectives only.
        # Inverses accumulate owner-local (the per-level broadcast is the
        # COMPACT lC/uC); one full psum at the phase boundary replicates
        # the tables for the solve (each phase-1 step has exactly one
        # owner device globally).
        # prefix mode runs levels [0, lmax) with lmax a runtime scalar
        # (the per-level profiler; the phase-boundary collectives always
        # execute — they are part of the SPMD program)
        p1_hi = jnp.minimum(lmax, max_p1) if prefix else max_p1
        pool, linv, uinv, tiny1 = lax.fori_loop(
            0, p1_hi, level, (pool, linv0, uinv0, jnp.zeros((), jnp.int32)))
        linv = lax.psum(lax.psum(lax.psum(linv, Z_AXIS), R_AXIS), C_AXIS)
        uinv = lax.psum(lax.psum(lax.psum(uinv, Z_AXIS), R_AXIS), C_AXIS)
        # cross-layer reduction (dreduceAllAncestors3d analog)
        anc = lax.psum(pool[_RESERVED:_RESERVED + max_anc], Z_AXIS)
        pool = pool.at[_RESERVED:_RESERVED + max_anc].set(anc)
        # phase 2: shared top — either computed redundantly on every
        # layer (replicated; r,c collectives only), or with the Schur
        # gemms z-split + per-level z-psum (the anc25d analog)
        p2_hi = (jnp.maximum(jnp.minimum(lmax, max_p1 + ntop), max_p1)
                 if prefix else max_p1 + ntop)
        pool, linv2, uinv2, tiny2 = lax.fori_loop(
            max_p1, p2_hi, make_level(zsplit),
            (pool, jnp.zeros_like(linv0), jnp.zeros_like(uinv0),
             jnp.zeros((), jnp.int32)))
        linv = linv + lax.psum(lax.psum(linv2, R_AXIS), C_AXIS)
        uinv = uinv + lax.psum(lax.psum(uinv2, R_AXIS), C_AXIS)
        tiny1 = lax.psum(lax.psum(lax.psum(tiny1, Z_AXIS), R_AXIS), C_AXIS)
        tiny2 = lax.psum(lax.psum(lax.psum(tiny2, Z_AXIS), R_AXIS),
                         C_AXIS) // dplan.pz
        return pool[None, None, None], linv[:nb], uinv[:nb], tiny1 + tiny2

    sharded = P(Z_AXIS, R_AXIS, C_AXIS)
    rep = P()
    ntapes = 18 if zsplit else 16
    fn = shard_map(spmd, mesh=mesh,
                   in_specs=(sharded, rep, rep) + (sharded,) * ntapes,
                   out_specs=(sharded, rep, rep, rep), check_vma=False)

    if prefix:
        @jax.jit
        def factor_prefix(pools, thresh, tapes, lmax):
            return fn(pools, thresh, lmax, *tapes)

        return factor_prefix

    @jax.jit
    def factor(pools, thresh, tapes):
        return fn(pools, thresh, jnp.int32(max_p1 + ntop), *tapes)

    return factor


def make_dist3d_factor_tapes(dplan: DistPlan3D):
    names = ["dptr", "dstep", "dloc", "dpil", "lptr", "lloc", "lpos",
             "lpil",
             "uptr", "uloc", "upos", "upil", "gptr", "glpos", "gupos",
             "gtloc"]
    if dplan.anc25d == "zsplit" and dplan.ntop > 0:
        names += ["t2ptr", "t2loc"]
    return tuple(jnp.asarray(getattr(dplan, n), dtype=jnp.int32)
                 for n in names)


def solve_sweeps_core3d(plan: SymbolicPlan, dplan: DistPlan3D, nrhs: int,
                        *, chunk: int = 16):
    """Per-device 3D L+U sweep body callable inside shard_map (the analog
    of dist2d.solve_sweeps_core): X replicated everywhere, per-level psums
    over all three axes (ancestor work assigned to layer 0 only, so
    nothing is double counted). Returns ``run(pool, linv, uinv,
    local_tapes, b)``."""
    nb, bs = dplan.nb, dplan.bs
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
            delta = lax.psum(lax.psum(lax.psum(delta, Z_AXIS), R_AXIS),
                             C_AXIS)
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

    def run(pool, linv, uinv, tapes, b):
        (lgp, lgl, lgs, lgd, ugp, ugl, ugs, ugd) = tapes
        X = b.reshape(nb, bs, nrhs)
        X = jnp.concatenate([X, jnp.zeros((1, bs, nrhs), X.dtype)], axis=0)
        X = sweep(pool, linv, lgp, lgl, lgs, lgd, X, nlvl_l, lg_len,
                  ldptr, ldiag, ldlen)
        X = sweep(pool, uinv, ugp, ugl, ugs, ugd, X, nlvl_u, ug_len,
                  udptr, udiag, udlen)
        return X[:nb].reshape(nb * bs, nrhs)

    return run


def build_dist3d_solve_fn(plan: SymbolicPlan, dplan: DistPlan3D,
                          grid: Grid3D, nrhs: int, *, chunk: int = 16):
    """Compile the SPMD 3D distributed solve (see solve_sweeps_core3d)."""
    run = solve_sweeps_core3d(plan, dplan, nrhs, chunk=chunk)

    def spmd(pools, linv, uinv, *args):
        tapes, b = args[:-1], args[-1]
        local = tuple(t[0, 0, 0] for t in tapes)
        return run(pools[0, 0, 0], linv, uinv, local, b)

    sharded = P(Z_AXIS, R_AXIS, C_AXIS)
    rep = P()
    fn = shard_map(spmd, mesh=grid.mesh,
                   in_specs=(sharded, rep, rep) + (sharded,) * 8 + (rep,),
                   out_specs=rep, check_vma=False)

    @jax.jit
    def solve(pools, linv, uinv, stapes, b):
        return fn(pools, linv, uinv, *stapes, b)

    return solve


def make_dist3d_solve_tapes(dplan: DistPlan3D):
    names = ["lsol_gptr", "lsol_gloc", "lsol_gsrc", "lsol_gdst",
             "usol_gptr", "usol_gloc", "usol_gsrc", "usol_gdst"]
    return tuple(jnp.asarray(getattr(dplan, n), dtype=jnp.int32)
                 for n in names)


# ---------------------------------------------------------------------------
# sharded NRLoc input on the 3D grid (dReDistribute_A over z x r x c)
# ---------------------------------------------------------------------------


def nrloc_entry_offsets3d(plan: SymbolicPlan, dplan: DistPlan3D, chunks,
                          row_scale, col_scale, rowperm, colperm,
                          expand, n_e, n, *, embed=False,
                          with_identity=False):
    """3D-grid owner mapping over dist2d.nrloc_slot_entries: ancestor
    slots land on their layer-0 replica (init convention of
    init_local_pools3d — the z reduction then counts each value once)."""
    from .dist2d import nrloc_slot_entries
    bs = plan.bs
    bb = bs * bs
    slot, ri, ci, v = nrloc_slot_entries(
        plan, chunks, row_scale, col_scale, rowperm, colperm,
        expand, n_e, n, embed=embed, with_identity=with_identity)
    z_of = np.where(dplan.slot_is_anc[slot], 0,
                    dplan.step_layer[plan.slot_step[slot]])
    dev = (z_of * (dplan.pr * dplan.pc)
           + np.asarray(dplan.slot_rc)[slot]).astype(np.int32)
    off = (np.asarray(dplan.slot_local)[slot] * bb
           + ri.astype(np.int64) * bs + ci)
    return dev, off.astype(np.int64), v


def init_local_pools3d_nrloc(plan: SymbolicPlan, dplan: DistPlan3D,
                             grid: Grid3D, dev, off, vals, dtype):
    """3D analog of dist2d.init_local_pools_nrloc: one device-side
    all-gather over the three mesh axes + chunked masked scatter into
    each device's (n_local, B, B) shard."""
    import jax
    from .dist2d import _agree_stream_len, _split_to_device_slots
    bs = plan.bs
    bb = bs * bs
    pr, pc = dplan.pr, dplan.pc
    n_local = dplan.n_local
    m = _agree_stream_len(grid, len(dev))
    sh = _split_to_device_slots(
        grid, (np.asarray(dev, np.int32), np.asarray(off, np.int64),
               np.asarray(vals, dtype)), (-1, 0, 0), m)
    mesh = grid.mesh
    shard = NamedSharding(mesh, P(Z_AXIS, R_AXIS, C_AXIS))
    gl = [jax.make_array_from_callback(a.shape, shard,
                                       lambda idx, a=a: a[idx])
          for a in sh]
    CH = 1 << 16

    def spmd(d, o, v):
        def gath(x):
            x = lax.all_gather(x[0, 0, 0], C_AXIS)
            x = lax.all_gather(x, R_AXIS)
            return lax.all_gather(x, Z_AXIS).reshape(-1)

        d, o, v = gath(d), gath(o), gath(v)
        L = d.shape[0]
        my = ((lax.axis_index(Z_AXIS).astype(jnp.int32) * pr
               + lax.axis_index(R_AXIS).astype(jnp.int32)) * pc
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

        pool = _chunked(0, L, CH, body, pool)
        return pool[None, None, None]

    fn = shard_map(spmd, mesh=mesh,
                   in_specs=(P(Z_AXIS, R_AXIS, C_AXIS),) * 3,
                   out_specs=P(Z_AXIS, R_AXIS, C_AXIS), check_vma=False)
    return jax.jit(fn)(*gl)


# ---------------------------------------------------------------------------
# 3D transposed solves (the trans branches of pdgstrs on the 3D grid)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DistTransPlan3D:
    """Tapes for the Aᵀ solve on the 3D grid: Uᵀ forward then Lᵀ backward
    level sweeps, work split like the forward solve (ancestor slots on
    layer 0)."""

    nlvl_u: int
    nlvl_l: int
    ut_gptr: np.ndarray
    ut_gloc: np.ndarray
    ut_gsrc: np.ndarray
    ut_gdst: np.ndarray
    lt_gptr: np.ndarray
    lt_gloc: np.ndarray
    lt_gsrc: np.ndarray
    lt_gdst: np.ndarray
    # replicated diag apply schedules
    ut_dptr: np.ndarray
    ut_diag: np.ndarray
    lt_dptr: np.ndarray
    lt_diag: np.ndarray


def trans_partition_plan3d(plan: SymbolicPlan,
                           dplan: DistPlan3D) -> DistTransPlan3D:
    from ..ops.kernels.blocklu import _trans_schedule
    pz, pr, pc = dplan.pz, dplan.pr, dplan.pc
    slot_layer = dplan.step_layer[plan.slot_step]
    gpu, gsu, gru, gdu, dpu, dgu, nlu = _trans_schedule(plan, "U")
    gpl, gsl, grl, gdl, dpl, dgl, nll = _trans_schedule(plan, "L")
    usg = _solve_pack3d(plan.nb, pz, pr, pc, dplan.slot_is_anc, slot_layer,
                        dplan.slot_rc, dplan.slot_local,
                        gpu, gsu, gru, gdu, nlu)
    lsg = _solve_pack3d(plan.nb, pz, pr, pc, dplan.slot_is_anc, slot_layer,
                        dplan.slot_rc, dplan.slot_local,
                        gpl, gsl, grl, gdl, nll)
    return DistTransPlan3D(
        nlvl_u=nlu, nlvl_l=nll,
        ut_gptr=usg[0], ut_gloc=usg[1], ut_gsrc=usg[2], ut_gdst=usg[3],
        lt_gptr=lsg[0], lt_gloc=lsg[1], lt_gsrc=lsg[2], lt_gdst=lsg[3],
        ut_dptr=dpu, ut_diag=dgu, lt_dptr=dpl, lt_diag=dgl,
    )


def make_dist3d_trans_tapes(tplan: DistTransPlan3D):
    names = ["ut_gptr", "ut_gloc", "ut_gsrc", "ut_gdst",
             "lt_gptr", "lt_gloc", "lt_gsrc", "lt_gdst"]
    return tuple(jnp.asarray(getattr(tplan, n), dtype=jnp.int32)
                 for n in names)


def build_dist3d_trans_solve_fn(plan: SymbolicPlan, dplan: DistPlan3D,
                                tplan: DistTransPlan3D, grid: Grid3D,
                                nrhs: int, *, chunk: int = 16):
    """Compile the SPMD 3D Aᵀ solve: transposed pool blocks and diagonal
    inverses, Uᵀ sweep first (reference: pdgstrs trans branches run over
    the same 3D structures)."""
    nb, bs = dplan.nb, dplan.bs
    ug_len = tplan.ut_gloc.shape[-1]
    lg_len = tplan.lt_gloc.shape[-1]
    udptr = jnp.asarray(tplan.ut_dptr, jnp.int32)
    udiag = jnp.asarray(np.concatenate([tplan.ut_diag, [nb]]), jnp.int32)
    ldptr = jnp.asarray(tplan.lt_dptr, jnp.int32)
    ldiag = jnp.asarray(np.concatenate([tplan.lt_diag, [nb]]), jnp.int32)
    udlen = len(tplan.ut_diag) + 1
    ldlen = len(tplan.lt_diag) + 1

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
                Pm = jnp.einsum("cji,cjk->cik", pool[si], X[src],
                                preferred_element_type=dtype,
                                precision=MATMUL_PRECISION)
                return delta.at[dst].add(-Pm)

            delta = _chunked(lo, hi, chunk, gemm, delta)
            delta = lax.psum(lax.psum(lax.psum(delta, Z_AXIS), R_AXIS),
                             C_AXIS)
            X = X + delta

            dlo, dhi = dptr[l], dptr[l + 1]

            def dapply(c, X):
                offs = dlo + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
                valid = offs < dhi
                offs = jnp.minimum(offs, dlen - 1)
                I = jnp.where(valid, diag[offs], nb)
                Ic = jnp.minimum(I, nb - 1)
                Y = jnp.einsum("cji,cjk->cik", dinv[Ic], X[I],
                               preferred_element_type=dtype,
                               precision=MATMUL_PRECISION)
                return X.at[I].set(Y)

            return _chunked(dlo, dhi, chunk, dapply, X)

        return lax.fori_loop(0, nlvl, level, X)

    def spmd(pools, linv, uinv, *args):
        tapes, b = args[:-1], args[-1]
        (ugp, ugl, ugs, ugd, lgp, lgl, lgs, lgd) = tuple(
            t[0, 0, 0] for t in tapes)
        pool = pools[0, 0, 0]
        X = b.reshape(nb, bs, -1)
        X = jnp.concatenate([X, jnp.zeros((1,) + X.shape[1:], X.dtype)],
                            axis=0)
        X = sweep(pool, uinv, ugp, ugl, ugs, ugd, X, tplan.nlvl_u, ug_len,
                  udptr, udiag, udlen)
        X = sweep(pool, linv, lgp, lgl, lgs, lgd, X, tplan.nlvl_l, lg_len,
                  ldptr, ldiag, ldlen)
        return X[:nb].reshape(nb * bs, -1)

    sharded = P(Z_AXIS, R_AXIS, C_AXIS)
    rep = P()
    fn = shard_map(spmd, mesh=grid.mesh,
                   in_specs=(sharded, rep, rep) + (sharded,) * 8 + (rep,),
                   out_specs=rep, check_vma=False)

    @jax.jit
    def solve(pools, linv, uinv, ttapes, b):
        return fn(pools, linv, uinv, *ttapes, b)

    return solve
