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

from ..utils.options import Options
from ..utils.stats import Stats
from ..parallel import dist2d
from ..parallel.grid import Grid2D
from .driver import SparseLU, _real_base, _real_eps


class DistributedSparseLU(SparseLU):

    _fused_refine_ok = True    # in-mesh fused refinement (see below)
    _device_solve_ok = False
    _embed_ok = False
    #: the distributed executors use native complex (CPU-mesh capable);
    #: planar recasting of the distributed path is not implemented yet
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

    def _preprocess(self, A, reuse_perms: bool, reuse_colperm: bool):
        from ..parallel import multihost as mh
        if mh.process_count() == 1 or reuse_perms:
            return super()._preprocess(A, reuse_perms, reuse_colperm)
        if mh.process_index() == 0:
            A3 = super()._preprocess(A, reuse_perms, reuse_colperm)
            mh.bcast_obj((self.row_scale, self.col_scale, self.rowperm,
                          self.colperm, self._expand, self._n_e,
                          self.equed))
            return A3
        (self.row_scale, self.col_scale, self.rowperm, self.colperm,
         self._expand, self._n_e, self.equed) = mh.bcast_obj()
        A3 = A.multiply(self.row_scale[:, None]) \
             .multiply(self.col_scale[None, :]).tocsc()
        A3 = A3[self.rowperm, :][self.colperm, :][:, self.colperm]
        return self._expand_A(sp.csc_matrix(A3))

    def _symbolic(self, A3):
        from ..parallel import multihost as mh
        if mh.process_count() == 1:
            return super()._symbolic(A3)
        if mh.process_index() == 0:
            plan = super()._symbolic(A3)
            mh.bcast_obj(plan)
            return plan
        return mh.bcast_obj()

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
            pools = dist2d.init_local_pools(plan, self.dplan, A3,
                                            self.dtype, self.grid)
            if (opts.dist_executor == "rdma"
                    and np.dtype(self.dtype) == np.float32):
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
                np.dtype(self.dtype).itemsize))

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
                    and np.dtype(self.dtype) == np.float32):
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
        nz = int(self._A_orig.getnnz(axis=1).max()) + 1
        safe1 = nz * np.finfo(np.float64).tiny
        safe2 = safe1 / np.finfo(np.float64).eps
        itmax = self.options.max_refine_steps
        rthresh = self.options.refine_rthresh

        from ..parallel import multihost as mh
        run = dist2d.solve_sweeps_core(plan, dplan, nrhs,
                                       chunk=self.options.gemm_chunk)
        pr, pc_ = grid.nprow, grid.npcol
        rows, cols, vals = dist2d.make_coo_shards(
            self._A_orig, pr * pc_, np.dtype(rdt))
        m = rows.shape[-1]
        coo_shards = tuple(
            mh.shard(grid.mesh, P(R_AXIS, C_AXIS), a.reshape(pr, pc_, m))
            for a in (rows, cols, vals))
        stapes = self.stapes

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

        def refine(pool, linv, uinv, _vals, prc, pcp, rs, cs, b, x0):
            if mh.process_count() > 1:
                prc, pcp, rs, cs, b, x0 = (
                    mh.replicate(grid.mesh, np.asarray(a))
                    for a in (prc, pcp, rs, cs, b, x0))
            return jfn(pool, linv, uinv, stapes, coo_shards,
                       prc, pcp, rs, cs, b, x0)

        self._solve_fns[key] = refine
        return refine

    def solve_transposed(self, b, conj: bool = False) -> np.ndarray:
        """Aᵀ solves need distributed transpose tapes, which are not built
        for the mesh-sharded pool; the inherited single-device path would
        crash deep in the executor with a shape mismatch."""
        raise NotImplementedError(
            "transpose solve is not supported by the distributed drivers "
            "yet; use the single-chip SparseLU for Trans.TRANS/CONJ")

    def rcond_1(self) -> float:
        raise NotImplementedError(
            "rcond_1 needs transpose solves, which the distributed drivers "
            "do not support yet")

    def diag_u(self) -> np.ndarray:
        """Diagonal of U gathered from the distributed pool."""
        import jax
        if jax.process_count() > 1:
            raise NotImplementedError(
                "diag_u needs the full pool on one host; gather factors "
                "with save_factors per process instead")
        pool = np.asarray(self.pool)   # (pr, pc, n_local, B, B)
        plan, dplan = self.plan, self.dplan
        bs, nb = plan.bs, plan.nb
        out = np.empty(nb * bs, dtype=pool.dtype)
        for k in range(nb):
            s = plan.diag_slot[k]
            d = dplan.owner_dev[s]
            r, c = divmod(int(d), dplan.pc)
            blk = pool[r, c, dplan.local_slot[s]]
            out[k * bs:(k + 1) * bs] = np.diag(blk)
        return out[self._diag_sel()]


def gssvx_dist(A, b, grid: Grid2D, options: Optional[Options] = None):
    """Distributed one-call driver. Returns (SolveResult, DistributedSparseLU)."""
    from .driver import SolveResult
    from ..utils.options import IterRefine
    options = options or Options()
    stat = Stats()
    lu = DistributedSparseLU(A, grid, options=options, stat=stat)
    x = lu.solve(b)
    if options.iter_refine != IterRefine.NOREFINE:
        x, berr = lu.refine(b, x)
    else:
        xb = x[:, None] if x.ndim == 1 else x
        bb = np.asarray(b)
        bb = bb[:, None] if bb.ndim == 1 else bb
        berr, _ = lu._berr(xb, bb)
    return SolveResult(x=x, berr=np.atleast_1d(berr), stat=stat), lu
