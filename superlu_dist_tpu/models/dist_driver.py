"""Mesh-distributed expert driver (``pdgssvx`` on a real process grid).

Same host-side pipeline as :class:`SparseLU` (equilibrate → MC64 → column
ordering → block symbolic), but the device phase runs SPMD over a
``Grid2D`` mesh: the block pool is sharded block-cyclically, the
factorization broadcasts panels with masked psums over the mesh axes, and
the triangular solves psum per-level partial sums (see parallel/dist2d.py).

On multi-host TPU slices the same code runs unchanged: the Mesh spans all
slice devices and XLA lowers the psums to ICI collectives.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from ..utils.options import Options, Trans
from ..utils.stats import Stats
from ..parallel import dist2d, multihost as _mh
from ..parallel.grid import Grid2D
from .driver import SparseLU, _real_base, _real_eps


class ShardedNRLocInput:
    """Mixin shared by the 2D and 3D mesh drivers: sharded NRLoc input
    (``local=True`` chunks, one set per process) stays distributed.
    Values gather ONLY to process 0 (device-side collective — the
    pdgssvx.c:768-794 gather role for rowperm/symbolic); the pool is
    built straight from the local chunks in each driver's
    ``_device_factor`` (dReDistribute_A analog). Host paths that need
    global values raise clear errors instead."""

    def _dist_planning_active(self) -> bool:
        return (self.options.dist_planning and self._nrloc is not None
                and _mh.process_count() > 1)

    def _validate_dist_planning(self) -> None:
        from ..utils.options import ColPerm, Equil, RowPerm
        o = self.options
        if (o.equil != Equil.NO
                or o.row_perm not in (RowPerm.NOROWPERM, RowPerm.MY_PERMR)
                or o.col_perm not in (ColPerm.NATURAL, ColPerm.MY_PERMC)
                or o.ilu_level is not None
                or "complex" in str(o.dtype)):
            raise ValueError(
                "dist_planning requires equil=NO, row_perm in "
                "{NOROWPERM, MY_PERMR}, col_perm in {NATURAL, MY_PERMC} "
                "a real dtype, and complete LU — equilibration/MC64/"
                "fill-reducing orderings read global values, and the "
                "complex ring embedding reshapes the block pattern "
                "(the reference's "
                "parallel-symbolic path has the same contract: it runs "
                "under a ParMETIS-supplied ordering, "
                "get_perm_c_parmetis.c:255)")

    def _ingest_input(self, A):
        from ..utils.nrloc import NRLocMatrix
        self._nrloc = None
        if isinstance(A, NRLocMatrix) and A.local:
            if _mh.process_count() == 1:
                raise ValueError("local=True NRLoc input requires "
                                 "multi-process execution")
            self._nrloc = A
            if self.options.dist_planning:
                # distributed planning: NO process assembles global
                # values or the scalar pattern — not even process 0.
                # Everything downstream works from local chunks + the
                # allgathered block keys (see _symbolic).
                self._validate_dist_planning()
                return A.to_partial_csc()
            # full precision with a dtype every process agrees on
            # regardless of its local nnz (an empty chunk must not
            # desynchronize the SPMD collective's aval)
            gdt = (np.complex128 if "complex" in self.options.dtype
                   else np.float64)
            rows, cols, vals = A.to_coo_arrays(gdt)
            Ag = dist2d.gather_values_to0(self.grid, rows, cols, vals,
                                          A.n, gdt)
            # process 0 preprocesses on the gathered matrix; the others
            # keep only their local rows (O(local nnz) host memory)
            return Ag if _mh.process_index() == 0 else A.to_partial_csc()
        return super()._ingest_input(A)

    def _preprocess(self, A, reuse_perms: bool, reuse_colperm: bool):
        """Sharded-input preprocessing, all fact_t staging modes
        (DOFACT / SamePattern / SamePattern_SameRowPerm — the reference
        supports the full staging with distributed input,
        pdgssvx.c:506-2783): process 0 works on the gathered matrix and
        broadcasts; the others consume the broadcast and never build a
        global A3 — their pools come from local chunks in
        ``_device_factor``."""
        if self._dist_planning_active():
            # every process runs the same cheap transforms locally — no
            # broadcast, no global matrix anywhere (psymbfact discipline)
            from ..utils.options import DiagScale, RowPerm
            n = self.n
            self.row_scale = np.ones(n)
            self.col_scale = np.ones(n)
            o = self.options
            self.rowperm = (np.asarray(o.user_rowperm, dtype=np.int64)
                            if o.row_perm == RowPerm.MY_PERMR
                            and o.user_rowperm is not None
                            else np.arange(n, dtype=np.int64))
            from ..utils.options import ColPerm as _CP
            self.colperm = (np.asarray(o.user_colperm, dtype=np.int64)
                            if o.col_perm == _CP.MY_PERMC
                            and o.user_colperm is not None
                            else np.arange(n, dtype=np.int64))
            self.equed = DiagScale.NOEQUIL
            self._expand = None
            self._n_e = None
            # global norm extras from local chunks (O(1) scalars each)
            vals = np.abs(self._A_orig.data) if self._A_orig.nnz else \
                np.zeros(1)
            local = (float(vals.max(initial=0.0)),
                     int(self._A_orig.getnnz(axis=1).max(initial=0)),
                     np.asarray(np.abs(self._A_orig).sum(axis=0)).ravel())
            gathered = _mh.allgather_obj(local)
            self._anorm_global = max(g[0] for g in gathered) or 1.0
            self._nz_global = max(g[1] for g in gathered)
            self._anorm1_global = float(
                np.sum([g[2] for g in gathered], axis=0).max())
            return self._A_orig
        if self._nrloc is not None and _mh.process_count() > 1:
            if _mh.process_index() != 0:
                if reuse_perms:
                    # SamePattern_SameRowPerm: scales/perms are reused
                    # wholesale; only the new matrix's norm extras arrive
                    extras = _mh.bcast_obj()
                else:
                    # DOFACT / SamePattern: fresh scales + perms
                    (self.row_scale, self.col_scale, self.rowperm,
                     self.colperm, self._expand, self._n_e, self.equed,
                     extras) = _mh.bcast_obj()
                self._anorm_global = extras["anorm"]
                self._anorm1_global = extras["anorm1"]
                self._nz_global = extras["nz"]
                return sp.csc_matrix((self.n, self.n))
            if reuse_perms:
                # process 0: rebuild A3 from the gathered values with the
                # stored transforms, then broadcast the norm extras the
                # other processes need for a consistent pivot threshold
                A3 = super()._preprocess(A, reuse_perms, reuse_colperm)
                extras = dict(
                    anorm=float(np.abs(A3.data).max()) if A3.nnz else 1.0,
                    anorm1=float(np.abs(A).sum(axis=0).max()),
                    nz=int(A.getnnz(axis=1).max()))
                _mh.bcast_obj(extras)
                self._anorm_global = extras["anorm"]
                self._anorm1_global = extras["anorm1"]
                self._nz_global = extras["nz"]
                return A3
        return super()._preprocess(A, reuse_perms, reuse_colperm)

    def _symbolic(self, A3):
        if self._dist_planning_active():
            # each process contributes only its chunk's BLOCK keys
            # (O(a_blocks) total — the scalar pattern never moves);
            # every process then derives the identical plan locally
            from ..ops.host.symbolic import block_symbolic_from_keys
            bs = self.options.block_size
            nb = max(1, -(-self.n // bs))
            P = sp.coo_matrix(self._A_orig)
            ipc = np.empty(self.n, dtype=np.int64)
            ipc[self.colperm] = np.arange(self.n)
            irp = np.empty(self.n, dtype=np.int64)
            irp[self.rowperm] = np.arange(self.n)
            r3 = ipc[irp[P.row]]
            c3 = ipc[P.col]
            keys = np.unique((r3 // bs) * nb + (c3 // bs))
            a_keys = np.unique(np.concatenate(_mh.allgather_obj(keys)))
            self.stat.counters["dist_planning_blocks"] = int(len(a_keys))
            self.stat.counters["dist_planning_local_keys"] = int(len(keys))
            return block_symbolic_from_keys(self.n, bs, a_keys)
        return super()._symbolic(A3)

    def _refine_hostloop(self, b, x0, **kw):
        if self._nrloc is not None and _mh.process_count() > 1:
            raise NotImplementedError(
                "host-loop refinement needs global A values; with sharded "
                "NRLoc input use real dtypes (in-mesh fused refinement) "
                "or pass a gathered matrix")
        return super()._refine_hostloop(b, x0, **kw)

    def _berr(self, x, b, trans=Trans.NOTRANS):
        if self._nrloc is not None and _mh.process_count() > 1:
            raise NotImplementedError(
                "componentwise berr on the host needs global A; with "
                "sharded NRLoc input run refine() (in-mesh berr) instead")
        return super()._berr(x, b, trans)


class DistributedSparseLU(ShardedNRLocInput, _mh.PreprocessOnce, SparseLU):

    _fused_refine_ok = True    # in-mesh fused refinement (see below)
    _device_solve_ok = False
    _escalate_ok = False       # mesh factor fns rebuild differently;
                               # precision escalation is single-chip only
    _adapt_ok = False          # planning runs once on process 0 — the
                               # adaptive retry loop must stay off-mesh
    #: complex64 rides the real ring embedding on TPU meshes (the f32
    #: collective/RDMA machinery reused unchanged; reference parity:
    #: SRC/complex16/pzgstrf.c on the same 2D grid); complex128 (and the
    #: CPU mesh default) stays native complex. Planar recasting of the
    #: distributed path is not implemented.
    _embed_ok = True
    _planar = False
    """2D block-cyclic distributed factorization (pdgssvx analog)."""

    def _align_standdown(self) -> bool:
        # the distributed level-batched executors are exactly what
        # etree alignment exists for — never stand down
        return False

    def __init__(self, A: sp.spmatrix, grid: Grid2D,
                 options: Optional[Options] = None,
                 stat: Optional[Stats] = None):
        self.grid = grid
        super().__init__(A, options=options, stat=stat)

    # -- multi-host: preprocess once on process 0, broadcast -------------
    #
    # The reference does the expensive host preprocessing on grid-0/layer-0
    # and MPI_Bcasts perms + scalars (pdgssvx3d.c:628-959); here process 0
    # runs equilibration/MC64/ordering/alignment/symbolic and broadcasts
    # the results; every process then rebuilds its cheap local state
    # (permuted matrix, partition, tapes) deterministically.

    # -- device phase overrides ----------------------------------------

    def _device_factor(self, A3: sp.csc_matrix):
        from jax.sharding import PartitionSpec as P
        from ..parallel import multihost as mh
        from ..parallel.grid import C_AXIS, R_AXIS
        opts, stat, plan = self.options, self.stat, self.plan
        mesh = self.grid.mesh
        spec_rc = P(R_AXIS, C_AXIS)
        with stat.phase("DIST"):
            self.dplan = dist2d.partition_plan(plan, self.grid.nprow,
                                               self.grid.npcol)
            self.tapes = tuple(
                mh.shard(mesh, spec_rc, t)
                for t in dist2d.make_dist_factor_tapes(self.dplan))
            self.stapes = tuple(
                mh.shard(mesh, spec_rc, t)
                for t in dist2d.make_dist_solve_tapes(self.dplan))
            if self._nrloc is not None and mh.process_count() > 1:
                # sharded input: map local chunk entries straight to
                # (owner device, pool offset) and exchange device-side
                # (dReDistribute_A, pddistribute.c:66-433) — no global
                # A3 values on this host
                dev, off, val = dist2d.nrloc_entry_offsets(
                    plan, self.dplan, self._nrloc.chunks,
                    self.row_scale, self.col_scale, self.rowperm,
                    self.colperm, self._expand, self._n_e, self.n,
                    embed=getattr(self, "_embed", False),
                    with_identity=mh.process_index() == 0)
                pools = dist2d.init_local_pools_nrloc(
                    plan, self.dplan, self.grid, dev, off, val,
                    self._fdtype)
            else:
                pools = dist2d.init_local_pools(plan, self.dplan, A3,
                                                self._fdtype, self.grid)
            if (opts.dist_executor == "rdma"
                    and np.dtype(self._fdtype) == np.float32):
                # fused one-kernel-per-device executor with remote-DMA
                # panel/inverse broadcasts (ICI puts on hardware;
                # interpret-simulated on the CPU mesh)
                import jax
                from ..parallel import dist2d_rdma
                interp = jax.devices()[0].platform != "tpu"
                self._factor_fn = dist2d_rdma.build_dist_factor_fn_rdma(
                    plan, self.dplan, self.grid, interpret=interp)
            else:
                self._factor_fn = dist2d.build_dist_factor_fn(
                    plan, self.dplan, self.grid, chunk=opts.gemm_chunk)
            stat.counters.update(self.dplan.comm_volume(
                np.dtype(self._fdtype).itemsize))

        with stat.phase("FACT"):
            thresh = mh.replicate(mesh, np.asarray(
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
            if (self.options.dist_executor == "rdma"
                    and np.dtype(self._fdtype) == np.float32):
                import jax
                from ..parallel import dist2d_rdma
                interp = jax.devices()[0].platform != "tpu"
                self._solve_fns[nrhs] = \
                    dist2d_rdma.build_dist_solve_fn_rdma(
                        self.plan, self.dplan, self.grid, nrhs,
                        interpret=interp)
            else:
                self._solve_fns[nrhs] = dist2d.build_dist_solve_fn(
                    self.plan, self.dplan, self.grid, nrhs,
                    chunk=self.options.gemm_chunk)
        return self._solve_fns[nrhs]

    def _bpad_rows(self) -> int:
        return self.plan.nb * self.plan.bs

    def _solve_factored(self, bp: np.ndarray) -> np.ndarray:
        from ..parallel import multihost as mh
        nrhs = bp.shape[1]
        return np.asarray(self._solve_fn(nrhs)(
            self.pool, self.linv, self.uinv, self.stapes,
            mh.replicate(self.grid.mesh, bp)))

    def _fused_refine_fn(self, nrhs: int):
        """In-mesh iterative refinement: the residual (distributed SpMV),
        the transforms, the distributed triangular sweeps, and the berr
        loop all run inside one jitted shard_map while_loop — no host
        round-trips, no single-device residuals (the pdgsmv_init + pdgsrfs
        in-place pattern, reference: SRC/double/pdgsmv.c:1-383,
        pdgsrfs.c:129-251). Same call signature as the single-device fused
        refine (the base ``refine()`` drives it); the COO value argument is
        ignored in favor of the mesh-sharded COO."""
        key = ("FR", nrhs)
        if key in self._solve_fns:
            return self._solve_fns[key]
        import jax
        from jax import lax
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        from ..parallel.grid import C_AXIS, R_AXIS

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

        from ..parallel import multihost as mh
        run = dist2d.solve_sweeps_core(plan, dplan, nrhs,
                                       chunk=self.options.gemm_chunk)
        pr, pc_ = grid.nprow, grid.npcol

        def build_coo_shards():
            """Mesh-sharded COO of the CURRENT matrix — re-captured per
            factorization epoch so a refactor() refines against the new
            values (a stale closure here silently refined against the
            OLD matrix; caught by the pdtest reuse sweep)."""
            if self._nrloc is not None and mh.process_count() > 1:
                # sharded input: each process's devices carry its local
                # rows (pdgsmv_init from local data; no global COO)
                shards3 = dist2d.make_coo_shards_nrloc(
                    self._nrloc.chunks, n, grid, np.dtype(rdt))
                return tuple(
                    mh.shard(grid.mesh, P(R_AXIS, C_AXIS), a)
                    for a in shards3)
            rows, cols, vals = dist2d.make_coo_shards(
                self._A_orig, pr * pc_, np.dtype(rdt))
            m = rows.shape[-1]
            return tuple(
                mh.shard(grid.mesh, P(R_AXIS, C_AXIS),
                         a.reshape(pr, pc_, m))
                for a in (rows, cols, vals))

        def spmd(pools, linvL, uinvL, *args):
            tapes = tuple(t[0, 0] for t in args[:16])
            rl, cl, vl = (a[0, 0] for a in args[16:19])
            prc, pcp, rs, cs, b, x0 = args[19:]
            pool = pools[0, 0]
            linv, uinv = linvL[0, 0], uinvL[0, 0]
            b = b.astype(rdt)
            va = jnp.abs(vl)

            def berr_of(x):
                r = b - dist2d.dist_spmv(rl, cl, vl, x, n)
                denom = dist2d.dist_spmv(rl, cl, va, jnp.abs(x), n) \
                    + jnp.abs(b)
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
                r = b - dist2d.dist_spmv(rl, cl, vl, x, n)
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

        sharded, rep = P(R_AXIS, C_AXIS), P()
        fn = shard_map(
            spmd, mesh=grid.mesh,
            in_specs=(sharded,) * (3 + 16 + 3) + (rep,) * 6,
            out_specs=(rep, rep, rep), check_vma=False)

        # global (mesh-spanning) arrays may not be closed over under
        # multi-process execution — ship the tapes/COO shards as arguments
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

    def _fused_cplx_ok(self) -> bool:
        # the in-mesh embed refine below; native complex (CPU mesh)
        # runs the real fused path. Sharded NRLoc input is excluded
        # (its per-process COO layout is real-valued only so far).
        return (self._fused_refine_ok and getattr(self, "_embed", False)
                and not (self._nrloc is not None
                         and _mh.process_count() > 1))

    def _fused_refine_fn_cplx(self, nrhs: int):
        """In-mesh refinement for the ring-embedded complex path: planar
        residual SpMV with psums, modulus berr, the distributed solve
        sweep on the embedded f32 pool — one jitted shard_map while_loop
        (the pzgsrfs analog on the mesh). Same (pool, linv, uinv, b2,
        x02) -> (x2, berr, it) contract as the single-chip variant."""
        key = ("FRC", nrhs)
        if key in self._solve_fns:
            return self._solve_fns[key]
        import jax
        from jax import lax
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        from ..parallel import multihost as mh
        from ..parallel.grid import C_AXIS, R_AXIS

        plan, dplan, grid = self.plan, self.dplan, self.grid
        n = self.n
        rb = jnp.dtype(_real_base(self.refine_dtype))
        fdt = jnp.dtype(np.float32)          # embedded pool precision
        rows_pad = self._bpad_rows()
        # transforms ship as replicated OPERANDS — mesh-spanning
        # computations may not close over process-local arrays under
        # multi-process execution (same rule as _fused_refine_fn)
        xf_host = (self._rows_idx[0::2], self._rows_idx[1::2],
                   self.rowperm[self.colperm], self.colperm,
                   np.asarray(self.row_scale[self.rowperm[self.colperm]],
                              dtype=rb),
                   np.asarray(self.col_scale[self.colperm], dtype=rb))
        eps = _real_eps(self.refine_dtype)
        safe1 = (self._max_row_nnz() + 1) * np.finfo(np.float64).tiny
        safe2 = safe1 / np.finfo(np.float64).eps
        itmax = self.options.max_refine_steps
        rthresh = self.options.refine_rthresh

        run = dist2d.solve_sweeps_core(plan, dplan, nrhs,
                                       chunk=self.options.gemm_chunk)
        pr, pc_ = grid.nprow, grid.npcol

        def build_coo_shards():
            # re-captured per factorization epoch (see _fused_refine_fn)
            rows, cols, vr, vi = dist2d.make_coo_shards_planar(
                self._A_orig, pr * pc_, np.dtype(rb))
            m = rows.shape[-1]
            return tuple(
                mh.shard(grid.mesh, P(R_AXIS, C_AXIS),
                         a.reshape(pr, pc_, m))
                for a in (rows, cols, vr, vi))

        def spmd(pools, linvL, uinvL, *args):
            tapes = tuple(t[0, 0] for t in args[:16])
            rl, cl, vrl, vil = (a[0, 0] for a in args[16:20])
            ri_re, ri_im, prc, pcp, rs, cs = args[20:26]
            b2, x02 = args[26:]
            pool = pools[0, 0]
            linv, uinv = linvL[0, 0], uinvL[0, 0]
            b2 = b2.astype(rb)
            va = jnp.sqrt(vrl * vrl + vil * vil)

            def berr_of(x2):
                r2 = b2 - dist2d.dist_spmv_planar(rl, cl, vrl, vil, x2, n)
                xm = jnp.sqrt(x2[0] * x2[0] + x2[1] * x2[1])
                denom = dist2d.dist_spmv(rl, cl, va, xm, n) \
                    + jnp.sqrt(b2[0] * b2[0] + b2[1] * b2[1])
                num = jnp.sqrt(r2[0] * r2[0] + r2[1] * r2[1])
                val = jnp.where(denom > safe2,
                                num / jnp.maximum(denom, safe1),
                                (num + safe1) / (denom + safe1))
                return val.max(axis=0), r2

            def lu_solve(r2):
                bp = jnp.zeros((rows_pad, nrhs), fdt)
                bp = bp.at[ri_re].set((rs[:, None] * r2[0][prc])
                                      .astype(fdt))
                bp = bp.at[ri_im].set((rs[:, None] * r2[1][prc])
                                      .astype(fdt))
                y = run(pool, linv, uinv, tapes, bp)
                z = jnp.zeros((n, nrhs), rb)
                return jnp.stack([
                    z.at[pcp].set(cs[:, None] * y[ri_re].astype(rb)),
                    z.at[pcp].set(cs[:, None] * y[ri_im].astype(rb))])

            def cond(carry):
                x2, berr, prev, it = carry
                keep = (berr > eps).any() & (berr <= rthresh * prev).all()
                return (it < itmax) & ((it == 0) | keep)

            def body(carry):
                x2, berr, prev, it = carry
                _, r2 = berr_of(x2)
                x2 = x2 + lu_solve(r2)
                nberr, _ = berr_of(x2)
                return (x2, nberr, berr, it + 1)

            berr0, _ = berr_of(x02.astype(rb))
            x2, berr, prev, it = lax.while_loop(
                cond, body,
                (x02.astype(rb), berr0,
                 jnp.full((nrhs,), jnp.inf, rb),
                 jnp.zeros((), jnp.int32)))
            return x2, berr, it

        sharded, rep = P(R_AXIS, C_AXIS), P()
        fn = shard_map(
            spmd, mesh=grid.mesh,
            in_specs=(sharded,) * (3 + 16 + 4) + (rep,) * 8,
            out_specs=(rep, rep, rep), check_vma=False)
        jfn = jax.jit(lambda pool, linv, uinv, st, coo, xf, b2, x02:
                      fn(pool, linv, uinv, *st, *coo, *xf, b2, x02))

        state = {"epoch": None, "coo": None}
        xf = tuple(mh.replicate(grid.mesh, np.asarray(a))
                   for a in xf_host)

        def refine(pool, linv, uinv, b2, x02):
            epoch = getattr(self, "_factor_epoch", 0)
            if state["epoch"] != epoch:
                state["coo"] = build_coo_shards()
                state["epoch"] = epoch
            if mh.process_count() > 1:
                b2, x02 = (mh.replicate(grid.mesh, np.asarray(a))
                           for a in (b2, x02))
            return jfn(pool, linv, uinv, self.stapes, state["coo"], xf,
                       b2, x02)

        self._solve_fns[key] = refine
        return refine

    def _trans_solve_fn(self, nrhs: int):
        """Distributed Aᵀ solve executor, slotted into the inherited
        ``solve_transposed`` host pipeline (same 6-argument signature as
        the single-chip executor; the single-chip transpose tapes are
        stubbed out — the mesh tapes ship as closure state)."""
        key = ("T", nrhs)
        if key not in self._solve_fns:
            from jax.sharding import PartitionSpec as P
            from ..parallel import multihost as mh
            from ..parallel.grid import C_AXIS, R_AXIS
            if not hasattr(self, "_ttapes"):
                self.tplan = dist2d.trans_partition_plan(self.plan,
                                                         self.dplan)
                self._ttapes = tuple(
                    mh.shard(self.grid.mesh, P(R_AXIS, C_AXIS), t)
                    for t in dist2d.make_dist_trans_tapes(self.tplan))
                # satisfy the base solve_transposed's tape staging without
                # building the (unused) single-chip tapes
                self.ttape_u = self.ttape_l = None
            core = dist2d.build_dist_trans_solve_fn(
                self.plan, self.dplan, self.tplan, self.grid, nrhs,
                chunk=self.options.gemm_chunk)

            def wrapper(pool, uinv, linv, _tu, _tl, bp):
                return core(pool, linv, uinv, self._ttapes,
                            mh.replicate(self.grid.mesh, np.asarray(bp)))

            self._solve_fns[key] = wrapper
        return self._solve_fns[key]

    def profile_levels(self):
        """Per-elimination-level device timings of the DISTRIBUTED
        factorization (the slu_SCT_printComm3D role): one compiled
        prefix program (levels [0, lmax) with runtime lmax) is timed at
        every prefix length; differences give per-level wall time on the
        mesh. Host-side tape metadata supplies the per-level work mix.
        Wall times on a virtual CPU mesh track program structure only."""
        import time as _time
        from ..parallel import multihost as mh
        plan, dplan, grid = self.plan, self.dplan, self.grid
        fn = dist2d.build_dist_factor_fn(
            plan, dplan, grid, chunk=self.options.gemm_chunk,
            prefix=True)
        # rebuild the initial pools from the stored transforms (the
        # factors stay live — the profile runs on its own pool copies)
        if self._nrloc is not None and mh.process_count() > 1:
            # sharded input: same local-chunk exchange as _device_factor
            # (no global A3 values on this host)
            dev, off, val = dist2d.nrloc_entry_offsets(
                plan, dplan, self._nrloc.chunks,
                self.row_scale, self.col_scale, self.rowperm,
                self.colperm, self._expand, self._n_e, self.n,
                embed=getattr(self, "_embed", False),
                with_identity=mh.process_index() == 0)
            pools0 = dist2d.init_local_pools_nrloc(
                plan, dplan, grid, dev, off, val, self._fdtype)
        else:
            A3 = self._A_orig.multiply(self.row_scale[:, None]) \
                             .multiply(self.col_scale[None, :]).tocsc()
            A3 = A3[self.rowperm, :][self.colperm, :][:, self.colperm]
            A3 = self._expand_A(sp.csc_matrix(A3))
            if getattr(self, "_embed", False):
                from .driver import _embed_csc
                A3 = _embed_csc(A3)
            pools0 = dist2d.init_local_pools(plan, dplan, A3, self._fdtype,
                                             grid)
        thresh = mh.replicate(grid.mesh, np.asarray(
            self._thresh(), dtype=_real_base(self.dtype)))
        nlvl = dplan.nlvl
        # warm the prefix compile
        out = fn(pools0, thresh, self.tapes, jnp.int32(0))
        out[0].block_until_ready()
        rows = []
        prev = 0.0
        dptr = dplan.dptr.reshape(-1, nlvl + 1)
        lptr = dplan.lptr.reshape(-1, nlvl + 1)
        uptr = dplan.uptr.reshape(-1, nlvl + 1)
        gptr = dplan.gptr.reshape(-1, nlvl + 1)
        for l in range(1, nlvl + 1):
            best = np.inf
            for _ in range(2):     # best-of-2 damps dispatch jitter
                t0 = _time.perf_counter()
                out = fn(pools0, thresh, self.tapes, jnp.int32(l))
                out[0].block_until_ready()
                best = min(best, _time.perf_counter() - t0)
            t = best
            rows.append(dict(
                level=l - 1, ms=round(max(0.0, t - prev) * 1e3, 3),
                steps=int((dptr[:, l] - dptr[:, l - 1]).sum()),
                lpanels=int((lptr[:, l] - lptr[:, l - 1]).sum()),
                upanels=int((uptr[:, l] - uptr[:, l - 1]).sum()),
                gemms=int((gptr[:, l] - gptr[:, l - 1]).sum())))
            prev = t
        self.stat.counters["profiled_levels"] = len(rows)
        return rows

    def _export_factors(self):
        """Gather the sharded factors into the canonical single-chip
        layout (global slots; inverses at step index) so save_factors
        checkpoints load as portable SolveOnly objects.

        Multi-process sessions run an in-mesh owner-gather (each device
        scatters its owned rows into a zero table, psum over both mesh
        axes → replicated result; the dgatherAllFactoredLU role,
        reference: pd3dcomm.c:1083) — every process receives the full
        factors; save_factors writes from process 0 only."""
        from ..parallel import multihost as mh
        if mh.process_count() > 1:
            return self._export_factors_collective()
        from ..ops.kernels.blocklu import bucket125, factor_buckets
        plan, dp = self.plan, self.dplan
        bs = plan.bs
        pool = np.asarray(self.pool)       # (pr, pc, n_local, B, B)
        linvL = np.asarray(self.linv)      # (pr, pc, dlen+1, B, B)
        uinvL = np.asarray(self.uinv)
        poolp = factor_buckets(plan).poolp
        out = np.zeros((poolp, bs, bs), pool.dtype)
        dev = np.asarray(dp.owner_dev)
        r, c = np.divmod(dev, dp.pc)
        out[: plan.nslots] = pool[r, c, np.asarray(dp.local_slot)]
        nbp = bucket125(plan.nb)
        linv = np.zeros((nbp + 1, bs, bs), pool.dtype)
        uinv = np.zeros((nbp + 1, bs, bs), pool.dtype)
        ds = np.asarray(plan.diag_slot)
        rd, cd = np.divmod(dev[ds], dp.pc)
        idx = np.asarray(dp.dinv_idx)
        linv[: plan.nb] = linvL[rd, cd, idx]
        uinv[: plan.nb] = uinvL[rd, cd, idx]
        return out, linv, uinv

    def _export_factors_collective(self):
        """In-mesh owner-gather of the sharded factors (multi-process
        save_factors): pool rows keyed by global slot, inverse rows keyed
        by elimination step."""
        from jax.sharding import PartitionSpec as P
        from ..ops.kernels.blocklu import bucket125, factor_buckets
        from ..parallel import multihost as mh
        from ..parallel.grid import C_AXIS, R_AXIS
        plan, dp = self.plan, self.dplan
        bs = plan.bs
        poolp = factor_buckets(plan).poolp
        full = poolp * bs * bs * np.dtype(self._fdtype).itemsize
        if full > 4 * 2**30:
            # the psum-gather materializes the FULL pool on every device
            # next to the live sharded factors — beyond ~4 GiB that OOMs
            # the very capacity sessions checkpoints exist for
            raise NotImplementedError(
                f"multi-process checkpoint of a {full/2**30:.1f} GiB pool "
                "exceeds the in-mesh gather budget — checkpoint from a "
                "single-process session at this scale")
        nbp = bucket125(plan.nb)
        pr, pc = dp.pr, dp.pc
        mesh = self.grid.mesh
        spec = P(R_AXIS, C_AXIS)
        n_local = self.pool.shape[2]
        trash = plan.nslots + 1          # < poolp, holds no real row
        # per-device local-row -> global-slot tables
        gsl = np.full((pr, pc, n_local), trash, dtype=np.int32)
        dev = np.asarray(dp.owner_dev)
        r, c = np.divmod(dev, pc)
        gsl[r, c, np.asarray(dp.local_slot)] = np.arange(plan.nslots)
        pool = mh.gather_sharded_blocks(
            mesh, spec, self.pool, mh.shard(mesh, spec, jnp.asarray(gsl)),
            poolp)
        pool[plan.nslots:] = 0
        # inverses: local dinv row -> global step on the diag owner
        dlen = self.linv.shape[2]
        gst = np.full((pr, pc, dlen), nbp, dtype=np.int32)
        ds = np.asarray(plan.diag_slot)
        rd, cd = np.divmod(dev[ds], pc)
        gst[rd, cd, np.asarray(dp.dinv_idx)] = np.arange(plan.nb)
        gst_dev = mh.shard(mesh, spec, jnp.asarray(gst))
        linv = mh.gather_sharded_blocks(mesh, spec, self.linv, gst_dev,
                                        nbp + 1)
        uinv = mh.gather_sharded_blocks(mesh, spec, self.uinv, gst_dev,
                                        nbp + 1)
        linv[plan.nb:] = 0
        uinv[plan.nb:] = 0
        return pool, linv, uinv

    def diag_u(self) -> np.ndarray:
        """Diagonal of U gathered in-mesh: every device contributes its
        owned diagonal rows into a replicated psum buffer, so no host ever
        needs the full pool (works multi-process; reference:
        pdGetDiagU.c's gather over the process grid)."""
        key = "DIAGU"
        if key not in self._solve_fns:
            import jax
            from jax import lax
            from jax.sharding import PartitionSpec as P
            from jax import shard_map
            from ..parallel import multihost as mh
            from ..parallel.grid import C_AXIS, R_AXIS
            plan, dplan = self.plan, self.dplan
            bs, nb = plan.bs, plan.nb
            ndev = dplan.pr * dplan.pc
            dev = np.asarray(dplan.owner_dev)[np.asarray(plan.diag_slot)]
            loc = np.asarray(dplan.local_slot)[np.asarray(plan.diag_slot)]
            maxk = max(1, int(np.bincount(dev, minlength=ndev).max()))
            ks = np.full((ndev, maxk), nb, dtype=np.int32)
            ls = np.zeros((ndev, maxk), dtype=np.int32)
            fill = np.zeros(ndev, dtype=np.int64)
            for k in range(nb):
                d = int(dev[k])
                ks[d, fill[d]] = k
                ls[d, fill[d]] = loc[k]
                fill[d] += 1
            sh = (dplan.pr, dplan.pc, maxk)
            tk = mh.shard(self.grid.mesh, P(R_AXIS, C_AXIS),
                          jnp.asarray(ks.reshape(sh)))
            tl = mh.shard(self.grid.mesh, P(R_AXIS, C_AXIS),
                          jnp.asarray(ls.reshape(sh)))

            emb = getattr(self, "_embed", False)

            def spmd(pools, ks, ls):
                pool = pools[0, 0]
                blocks = pool[ls[0, 0]]
                d = jnp.diagonal(blocks, axis1=-2, axis2=-1)
                out = jnp.zeros((nb + 1, bs), pool.dtype).at[ks[0, 0]].set(d)
                out = lax.psum(lax.psum(out[:nb], R_AXIS), C_AXIS)
                if not emb:
                    return out, out
                # embedded blocks also carry Im(U_kk) at (2j+1, 2j)
                s = blocks[:, jnp.arange(1, bs, 2), jnp.arange(0, bs, 2)]
                sub = jnp.zeros((nb + 1, bs // 2),
                                pool.dtype).at[ks[0, 0]].set(s)
                return out, lax.psum(lax.psum(sub[:nb], R_AXIS), C_AXIS)

            fn = shard_map(spmd, mesh=self.grid.mesh,
                           in_specs=(P(R_AXIS, C_AXIS),) * 3,
                           out_specs=(P(), P()), check_vma=False)
            self._solve_fns[key] = jax.jit(
                lambda pool: fn(pool, tk, tl))
        d, s = self._solve_fns[key](self.pool)
        out = np.asarray(d).reshape(-1)
        if getattr(self, "_embed", False):
            out = out[0::2] + 1j * np.asarray(s).reshape(-1)
        return out[self._diag_sel()]


def gssvx_dist(A, b, grid: Grid2D, options: Optional[Options] = None):
    """Distributed one-call driver. Returns (SolveResult, DistributedSparseLU)."""
    from .driver import SolveResult
    from ..utils.options import IterRefine
    options = options or Options()
    stat = Stats()
    lu = DistributedSparseLU(A, grid, options=options, stat=stat)
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
