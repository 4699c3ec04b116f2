"""3D communication-avoiding expert driver (``pdgssvx3d`` analog).

Host preprocessing is identical to the 2D drivers (the reference also does
preprocessing on layer 0 and broadcasts, pdgssvx3d.c:628-959 — here the
host plays that role); the device phase partitions the elimination forest
over the z mesh axis (parallel/dist3d.py) so each layer factors its
subtrees independently, with one ancestor psum over 'z' replacing
per-step cross-layer communication.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from ..utils.options import Options
from ..utils.stats import Stats
from ..parallel import dist3d, multihost as _mh
from ..parallel.grid import Grid3D
from .driver import SparseLU, _real_base


from .dist_driver import ShardedNRLocInput


class Distributed3DSparseLU(ShardedNRLocInput, _mh.PreprocessOnce,
                            SparseLU):

    #: complex64 rides the real ring embedding (f32 executors unchanged,
    #: see dist_driver); complex128 / CPU-mesh default is native complex
    _embed_ok = True
    _planar = False

    _fused_refine_ok = True    # in-mesh fused refinement (see below)
    _escalate_ok = False       # see dist_driver
    _adapt_ok = False
    _device_solve_ok = False
    """3D (z × r × c) distributed factorization."""

    def _align_standdown(self) -> bool:
        # level-batched 3D executor wants the etree-aligned schedule
        return False

    def __init__(self, A: sp.spmatrix, grid: Grid3D,
                 options: Optional[Options] = None,
                 stat: Optional[Stats] = None):
        self.grid = grid
        super().__init__(A, options=options, stat=stat)

    def _device_factor(self, A3: sp.csc_matrix):
        from jax.sharding import PartitionSpec as P
        from ..parallel.grid import C_AXIS, R_AXIS, Z_AXIS
        opts, stat, plan = self.options, self.stat, self.plan
        g = self.grid
        spec = P(Z_AXIS, R_AXIS, C_AXIS)
        with stat.phase("DIST"):
            self.dplan = dist3d.partition_plan3d(plan, g.npdep, g.nprow,
                                                 g.npcol,
                                                 anc25d=opts.anc25d)
            self.tapes = tuple(
                _mh.shard(g.mesh, spec, t)
                for t in dist3d.make_dist3d_factor_tapes(self.dplan))
            if self.dplan.anc25d == "zsplit":
                # comm-volume counter for the zsplit tradeoff: one z-psum
                # of (max_tact+1) blocks per top level
                stat.counters["anc25d_zsplit_psum_bytes"] = int(
                    self.dplan.ntop * (self.dplan.max_tact + 1)
                    * plan.bs * plan.bs
                    * np.dtype(self._fdtype).itemsize)
            self.stapes = tuple(
                _mh.shard(g.mesh, spec, t)
                for t in dist3d.make_dist3d_solve_tapes(self.dplan))
            if self._nrloc is not None and _mh.process_count() > 1:
                dev, off, val = dist3d.nrloc_entry_offsets3d(
                    plan, self.dplan, self._nrloc.chunks,
                    self.row_scale, self.col_scale, self.rowperm,
                    self.colperm, self._expand, self._n_e, self.n,
                    embed=getattr(self, "_embed", False),
                    with_identity=_mh.process_index() == 0)
                pools = dist3d.init_local_pools3d_nrloc(
                    plan, self.dplan, g, dev, off, val, self._fdtype)
            else:
                pools = dist3d.init_local_pools3d(plan, self.dplan, A3,
                                                  self._fdtype, g)
            self._factor_fn = dist3d.build_dist3d_factor_fn(
                plan, self.dplan, g, chunk=opts.gemm_chunk)
            stat.counters.update(self.dplan.comm_volume(
                np.dtype(self._fdtype).itemsize))
            stat.counters["anc_steps"] = float(
                np.sum(self.dplan.step_layer < 0))
            for z in range(g.npdep):
                stat.counters[f"layer{z}_steps"] = float(
                    np.sum(self.dplan.step_layer == z))

        with stat.phase("FACT"):
            thresh = _mh.replicate(g.mesh, np.asarray(
                self._thresh(), dtype=_real_base(self.dtype)))
            pools, linv, uinv, tiny = self._factor_fn(
                pools, thresh, self.tapes)
            pools.block_until_ready()
        self.pool = pools
        self.linv = linv
        self.uinv = uinv
        stat.tiny_pivots += int(tiny)

    def _solve_fn(self, nrhs: int):
        if nrhs not in self._solve_fns:
            self._solve_fns[nrhs] = dist3d.build_dist3d_solve_fn(
                self.plan, self.dplan, self.grid, nrhs,
                chunk=self.options.gemm_chunk)
        return self._solve_fns[nrhs]

    def _bpad_rows(self) -> int:
        return self.plan.nb * self.plan.bs

    def _solve_factored(self, bp: np.ndarray) -> np.ndarray:
        nrhs = bp.shape[1]
        return np.asarray(self._solve_fn(nrhs)(
            self.pool, self.linv, self.uinv, self.stapes,
            _mh.replicate(self.grid.mesh, bp)))

    def _fused_refine_fn(self, nrhs: int):
        """In-mesh iterative refinement on the 3D grid (the pdgsrfs3d
        analog, reference: pdgssvx3d.c:1600): COO entry shards across all
        z×r×c devices, residuals psum-reduced over the three axes, solve
        sweeps from solve_sweeps_core3d, the whole berr loop one jitted
        shard_map while_loop. Same call signature as the base fused
        refine."""
        key = ("FR", nrhs)
        if key in self._solve_fns:
            return self._solve_fns[key]
        import jax
        from jax import lax
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        from ..parallel import dist2d, multihost as mh
        from ..parallel.grid import C_AXIS, R_AXIS, Z_AXIS
        from .driver import _real_eps

        plan, dplan, grid = self.plan, self.dplan, self.grid
        n = self.n
        rdt = jnp.dtype(self.refine_dtype)
        fdt = jnp.dtype(self.dtype)
        rows_pad = self._bpad_rows()
        ridx = jnp.asarray(self._rows_idx)
        eps = _real_eps(rdt)
        nz = self._max_row_nnz() + 1
        safe1 = nz * np.finfo(np.float64).tiny
        safe2 = safe1 / np.finfo(np.float64).eps
        itmax = self.options.max_refine_steps
        rthresh = self.options.refine_rthresh

        run = dist3d.solve_sweeps_core3d(plan, dplan, nrhs,
                                         chunk=self.options.gemm_chunk)
        pz, pr, pc_ = grid.npdep, grid.nprow, grid.npcol

        def build_coo_shards():
            """Re-captured per factorization epoch — a stale closure
            would refine against the OLD matrix after refactor() (see
            dist_driver._fused_refine_fn)."""
            if self._nrloc is not None and mh.process_count() > 1:
                shards3 = dist2d.make_coo_shards_nrloc(
                    self._nrloc.chunks, n, grid, np.dtype(rdt))
                return tuple(
                    mh.shard(grid.mesh, P(Z_AXIS, R_AXIS, C_AXIS), a)
                    for a in shards3)
            rows, cols, vals = dist2d.make_coo_shards(
                self._A_orig, pz * pr * pc_, np.dtype(rdt))
            m = rows.shape[-1]
            return tuple(
                mh.shard(grid.mesh, P(Z_AXIS, R_AXIS, C_AXIS),
                         a.reshape(pz, pr, pc_, m))
                for a in (rows, cols, vals))

        def spmv3(rl, cl, vl, x):
            part = jnp.zeros((n + 1, x.shape[1]), x.dtype)
            part = part.at[rl].add(vl[:, None] * x[cl])
            return lax.psum(lax.psum(lax.psum(part, Z_AXIS), R_AXIS),
                            C_AXIS)[:n]

        def spmd(pools, linv, uinv, *args):
            tapes = tuple(t[0, 0, 0] for t in args[:8])
            rl, cl, vl = (a[0, 0, 0] for a in args[8:11])
            prc, pcp, rs, cs, b, x0 = args[11:]
            pool = pools[0, 0, 0]
            b = b.astype(rdt)
            va = jnp.abs(vl)

            def berr_of(x):
                r = b - spmv3(rl, cl, vl, x)
                denom = spmv3(rl, cl, va, jnp.abs(x)) + jnp.abs(b)
                num = jnp.abs(r)
                val = jnp.where(denom > safe2,
                                num / jnp.maximum(denom, safe1),
                                (num + safe1) / (denom + safe1))
                return val.max(axis=0), r

            def lu_solve(r):
                bp = jnp.zeros((rows_pad, nrhs), fdt)
                bp = bp.at[ridx].set((rs[:, None] * r[prc]).astype(fdt))
                y = run(pool, linv, uinv, tapes, bp)[ridx]
                return jnp.zeros((n, nrhs), rdt).at[pcp].set(
                    cs[:, None] * y.astype(rdt))

            def cond(carry):
                x, berr, prev, it = carry
                keep = (berr > eps).any() & (berr <= rthresh * prev).all()
                return (it < itmax) & ((it == 0) | keep)

            def body(carry):
                x, berr, prev, it = carry
                r = b - spmv3(rl, cl, vl, x)
                x = x + lu_solve(r)
                nberr, _ = berr_of(x)
                return (x, nberr.astype(berr.dtype), berr, it + 1)

            berr0, _ = berr_of(x0.astype(rdt))
            rreal = jnp.dtype(np.zeros((), rdt).real.dtype)
            x, berr, prev, it = lax.while_loop(
                cond, body,
                (x0.astype(rdt), berr0.astype(rreal),
                 jnp.full((nrhs,), jnp.inf, rreal),
                 jnp.zeros((), jnp.int32)))
            return x, berr, it

        sharded, rep = P(Z_AXIS, R_AXIS, C_AXIS), P()
        fn = shard_map(
            spmd, mesh=grid.mesh,
            in_specs=(sharded, rep, rep) + (sharded,) * (8 + 3)
            + (rep,) * 6,
            out_specs=(rep, rep, rep), check_vma=False)

        jfn = jax.jit(lambda pool, linv, uinv, st, coo, prc, pcp, rs, cs,
                      b, x0: fn(pool, linv, uinv, *st, *coo,
                                prc, pcp, rs, cs, b, x0))

        state = {"epoch": None, "coo": None}

        def refine(pool, linv, uinv, _vals, prc, pcp, rs, cs, b, x0):
            epoch = getattr(self, "_factor_epoch", 0)
            if state["epoch"] != epoch:
                state["coo"] = build_coo_shards()
                state["epoch"] = epoch
            if mh.process_count() > 1:
                prc, pcp, rs, cs, b, x0 = (
                    mh.replicate(grid.mesh, np.asarray(a))
                    for a in (prc, pcp, rs, cs, b, x0))
            return jfn(pool, linv, uinv, self.stapes, state["coo"],
                       prc, pcp, rs, cs, b, x0)

        self._solve_fns[key] = refine
        return refine

    def _trans_solve_fn(self, nrhs: int):
        """3D distributed Aᵀ solve executor slotted into the inherited
        ``solve_transposed`` pipeline (see dist_driver._trans_solve_fn)."""
        key = ("T", nrhs)
        if key not in self._solve_fns:
            from jax.sharding import PartitionSpec as P
            from ..parallel.grid import C_AXIS, R_AXIS, Z_AXIS
            if not hasattr(self, "_ttapes"):
                self.tplan = dist3d.trans_partition_plan3d(self.plan,
                                                           self.dplan)
                self._ttapes = tuple(
                    _mh.shard(self.grid.mesh, P(Z_AXIS, R_AXIS, C_AXIS), t)
                    for t in dist3d.make_dist3d_trans_tapes(self.tplan))
                self.ttape_u = self.ttape_l = None
            core = dist3d.build_dist3d_trans_solve_fn(
                self.plan, self.dplan, self.tplan, self.grid, nrhs,
                chunk=self.options.gemm_chunk)

            def wrapper(pool, uinv, linv, _tu, _tl, bp):
                return core(pool, linv, uinv, self._ttapes,
                            _mh.replicate(self.grid.mesh, np.asarray(bp)))

            self._solve_fns[key] = wrapper
        return self._solve_fns[key]

    def profile_levels(self):
        """Per-level device timings on the 3D mesh (the
        slu_SCT_printComm3D role; see dist_driver.profile_levels) —
        phase-1 layer levels followed by the top levels."""
        import time as _time
        plan, dplan, g = self.plan, self.dplan, self.grid
        fn = dist3d.build_dist3d_factor_fn(
            plan, dplan, g, chunk=self.options.gemm_chunk, prefix=True)
        if self._nrloc is not None and _mh.process_count() > 1:
            # sharded input: local-chunk exchange (see _device_factor)
            dev, off, val = dist3d.nrloc_entry_offsets3d(
                plan, dplan, self._nrloc.chunks,
                self.row_scale, self.col_scale, self.rowperm,
                self.colperm, self._expand, self._n_e, self.n,
                embed=getattr(self, "_embed", False),
                with_identity=_mh.process_index() == 0)
            pools0 = dist3d.init_local_pools3d_nrloc(
                plan, dplan, g, dev, off, val, self._fdtype)
        else:
            A3 = self._A_orig.multiply(self.row_scale[:, None]) \
                             .multiply(self.col_scale[None, :]).tocsc()
            A3 = A3[self.rowperm, :][self.colperm, :][:, self.colperm]
            A3 = self._expand_A(sp.csc_matrix(A3))
            if getattr(self, "_embed", False):
                from .driver import _embed_csc
                A3 = _embed_csc(A3)
            pools0 = dist3d.init_local_pools3d(plan, dplan, A3,
                                               self._fdtype, g)
        thresh = _mh.replicate(g.mesh, np.asarray(
            self._thresh(), dtype=_real_base(self.dtype)))
        nlvl = dplan.max_p1 + dplan.ntop
        out = fn(pools0, thresh, self.tapes, jnp.int32(0))
        out[0].block_until_ready()
        rows = []
        prev = 0.0
        dptr = dplan.dptr.reshape(-1, nlvl + 1)
        gptr = dplan.gptr.reshape(-1, nlvl + 1)
        for l in range(1, nlvl + 1):
            best = np.inf
            for _ in range(2):
                t0 = _time.perf_counter()
                out = fn(pools0, thresh, self.tapes, jnp.int32(l))
                out[0].block_until_ready()
                best = min(best, _time.perf_counter() - t0)
            top = l - 1 >= dplan.max_p1
            # top-level tape entries are replicated across the z layers
            # (zsplit gemms are not) — count each once
            sdiv = dplan.pz if top else 1
            gdiv = (1 if (top and dplan.anc25d == "zsplit")
                    else sdiv)
            rows.append(dict(
                level=l - 1, phase=("top" if top else "layer"),
                ms=round(max(0.0, best - prev) * 1e3, 3),
                steps=int((dptr[:, l] - dptr[:, l - 1]).sum()) // sdiv,
                gemms=int((gptr[:, l] - gptr[:, l - 1]).sum()) // gdiv))
            prev = best
        self.stat.counters["profiled_levels"] = len(rows)
        return rows

    def _export_factors(self):
        """Gather the z/r/c-sharded factors into the canonical
        single-chip layout (see dist_driver._export_factors).

        Multi-process: in-mesh owner-gather of the pool (each slot
        contributed by its canonical owner only — ancestor replicas on
        z>0 are excluded so the psum sees exactly one copy); the 3D
        inverse tables are already mesh-replicated."""
        if _mh.process_count() > 1:
            return self._export_factors_collective3d()
        from ..ops.kernels.blocklu import bucket125, factor_buckets
        plan, dp = self.plan, self.dplan
        bs = plan.bs
        pool = np.asarray(self.pool)   # (pz, pr, pc, n_local, B, B)
        z = np.where(np.asarray(dp.slot_is_anc), 0,
                     np.asarray(dp.step_layer)[np.asarray(plan.slot_step)])
        r, c = np.divmod(np.asarray(dp.slot_rc), dp.pc)
        poolp = factor_buckets(plan).poolp
        out = np.zeros((poolp, bs, bs), pool.dtype)
        out[: plan.nslots] = pool[z, r, c, np.asarray(dp.slot_local)]
        # 3D inverses are already global (nb, B, B); pad to the
        # canonical (nbp+1) table
        nbp = bucket125(plan.nb)
        linv = np.zeros((nbp + 1, bs, bs), pool.dtype)
        uinv = np.zeros((nbp + 1, bs, bs), pool.dtype)
        li, ui = np.asarray(self.linv), np.asarray(self.uinv)
        linv[: li.shape[0]] = li
        uinv[: ui.shape[0]] = ui
        return out, linv, uinv

    def _export_factors_collective3d(self):
        """Multi-process 3D owner-gather (see _export_factors)."""
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        from ..ops.kernels.blocklu import bucket125, factor_buckets
        from ..parallel.grid import C_AXIS, R_AXIS, Z_AXIS
        plan, dp = self.plan, self.dplan
        bs = plan.bs
        poolp = factor_buckets(plan).poolp
        full = poolp * bs * bs * np.dtype(self._fdtype).itemsize
        if full > 4 * 2**30:
            raise NotImplementedError(
                f"multi-process checkpoint of a {full/2**30:.1f} GiB pool "
                "exceeds the in-mesh gather budget — checkpoint from a "
                "single-process session at this scale")
        mesh = self.grid.mesh
        spec = P(Z_AXIS, R_AXIS, C_AXIS)
        pz, pr, pc = self.pool.shape[:3]
        n_local = self.pool.shape[3]
        trash = plan.nslots + 1
        z = np.where(np.asarray(dp.slot_is_anc), 0,
                     np.asarray(dp.step_layer)[np.asarray(plan.slot_step)])
        r, c = np.divmod(np.asarray(dp.slot_rc), dp.pc)
        gsl = np.full((pz, pr, pc, n_local), trash, dtype=np.int32)
        gsl[z, r, c, np.asarray(dp.slot_local)] = np.arange(plan.nslots)
        pool = _mh.gather_sharded_blocks(
            mesh, spec, self.pool,
            _mh.shard(mesh, spec, jnp.asarray(gsl)), poolp)
        pool[plan.nslots:] = 0
        # inverses are mesh-replicated (nb, B, B): addressable everywhere
        nbp = bucket125(plan.nb)
        linv = np.zeros((nbp + 1, bs, bs), pool.dtype)
        uinv = np.zeros((nbp + 1, bs, bs), pool.dtype)
        li, ui = np.asarray(self.linv), np.asarray(self.uinv)
        linv[: li.shape[0]] = li
        uinv[: ui.shape[0]] = ui
        return pool, linv, uinv

    def diag_u(self) -> np.ndarray:
        pool = np.asarray(self.pool)   # (pz, pr, pc, n_local, B, B)
        plan, dplan = self.plan, self.dplan
        bs, nb = plan.bs, plan.nb
        emb = getattr(self, "_embed", False)
        out = np.empty(nb * bs, dtype=pool.dtype)
        sub = np.empty(nb * (bs // 2), dtype=pool.dtype) if emb else None
        for k in range(nb):
            s = plan.diag_slot[k]
            z = 0 if dplan.slot_is_anc[s] else int(dplan.step_layer[k])
            r, c = divmod(int(dplan.slot_rc[s]), dplan.pc)
            blk = pool[z, r, c, dplan.slot_local[s]]
            out[k * bs:(k + 1) * bs] = np.diag(blk)
            if emb:   # Im(U_kk) lives at (2j+1, 2j) of the embedded block
                sub[k * (bs // 2):(k + 1) * (bs // 2)] = \
                    blk[np.arange(1, bs, 2), np.arange(0, bs, 2)]
        if emb:
            out = out[0::2] + 1j * sub
        return out[self._diag_sel()]


def gssvx3d(A, b, grid: Grid3D, options: Optional[Options] = None):
    """3D one-call driver. Returns (SolveResult, Distributed3DSparseLU)."""
    from .driver import SolveResult
    from ..utils.options import IterRefine
    options = options or Options()
    stat = Stats()
    lu = Distributed3DSparseLU(A, grid, options=options, stat=stat)
    # honor options.trans (the options->Trans contract, pdgssvx.c:622):
    # solve, refinement residuals, and berr all use A / A^T / A^H
    x = lu.solve(b, trans=options.trans)
    if options.iter_refine != IterRefine.NOREFINE:
        x, berr = lu.refine(b, x, trans=options.trans)
    else:
        xb = x[:, None] if x.ndim == 1 else x
        bb = np.asarray(b)
        bb = bb[:, None] if bb.ndim == 1 else bb
        berr, _ = lu._berr(xb, bb, trans=options.trans)
    rcond = None
    if options.condition_number:
        with stat.phase("RCOND"):
            rcond = lu.rcond_1()
    return SolveResult(x=x, berr=np.atleast_1d(berr), stat=stat,
                       rcond=rcond), lu
