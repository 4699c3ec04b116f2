"""Batched many-matrix interface.

Two paths, mirroring the reference's batched capabilities:

1. **Same-pattern vmap batch** (:class:`BatchedSparseLU`) — N matrices with
   identical sparsity structure factor as one vmapped executor over a
   batched block pool: the TPU-native analog of the MAGMA vbatched dense
   kernels used per forest leaf (reference:
   CplusplusFactor/batch_factorize.cu:544-592). Preprocessing that fixes
   the structure (row/column permutations, symbolic plan) is shared from
   the first matrix; equilibration scalings and the tiny-pivot threshold
   are recomputed per matrix (SamePattern_SameRowPerm semantics: the
   reference redoes pdgsequ under that mode but keeps perm_r/perm_c,
   pdgssvx.c Equil handling). The first matrix additionally carries the
   MC64 dual scalings its row permutation was computed with.

2. **Block-diagonal composite** (:func:`gssvx_batch`) — heterogeneous
   matrices are each equilibrated, statically pivoted, and ordered
   (the dequil_batch / dpivot_batch / get_perm_c_batch pipeline,
   reference: SRC/double/pdgssvx3d_csc_batch.c:80-503), then assembled
   into one block-diagonal system and factored in a single call; solutions
   are split back per matrix.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ..utils.options import Equil, Fact, IterRefine, Options, RowPerm, ColPerm
from ..utils.stats import Stats
from ..ops.host import equil as _equil
from ..ops.host import mc64 as _mc64
from ..ops.host import ordering as _ordering
from ..ops.kernels import blocklu as _blocklu
from .driver import SolveResult, SparseLU, _real_base


class BatchedSparseLU:
    """Factor a batch of same-pattern matrices with one vmapped executor."""

    def __init__(self, As: Sequence[sp.spmatrix],
                 options: Optional[Options] = None):
        if not As:
            raise ValueError("empty batch")
        self.options = options or Options()
        self.stat = Stats()
        self.count = len(As)
        # shared preprocessing from the first matrix
        self._proto = SparseLU(As[0], self.options.replace(
            iter_refine=IterRefine.NOREFINE), stat=self.stat)
        self.n = self._proto.n
        plan = self._proto.plan
        self.plan = plan
        ref_pattern = sp.csc_matrix(As[0]).indptr, sp.csc_matrix(As[0]).indices

        # per-matrix scalings + threshold (SamePattern_SameRowPerm: fresh
        # equilibration per matrix, shared perms). Matrix 0 keeps the proto
        # scalings (which fold in the MC64 duals its perm was derived from).
        p = self._proto
        self.row_scales = [p.row_scale]
        self.col_scales = [p.col_scale]
        pools = [np.asarray(self._pool_values(As[0], p.row_scale,
                                              p.col_scale))]
        threshs = [p._thresh()]
        for A in As[1:]:
            Ac = sp.csc_matrix(A)
            if (not np.array_equal(Ac.indptr, ref_pattern[0])
                    or not np.array_equal(Ac.indices, ref_pattern[1])):
                raise ValueError(
                    "BatchedSparseLU requires identical sparsity patterns; "
                    "use gssvx_batch for heterogeneous matrices")
            if self.options.equil == Equil.YES:
                _, R, C, _ = _equil.equilibrate(Ac)
            else:
                R = C = np.ones(self.n)
            self.row_scales.append(R)
            self.col_scales.append(C)
            pools.append(np.asarray(self._pool_values(Ac, R, C)))
            A3 = Ac.multiply(R[:, None]).multiply(C[None, :]).tocsc()
            threshs.append(float(np.sqrt(np.finfo(
                _real_base(p.dtype)).eps)) * float(np.abs(A3.data).max())
                if self.options.replace_tiny_pivot and A3.nnz else 0.0)
        pool_b = jnp.asarray(np.stack(pools))
        self.row_scales = np.stack(self.row_scales)
        self.col_scales = np.stack(self.col_scales)

        core = _blocklu.build_factor_core(plan,
                                          chunk=self.options.gemm_chunk)
        thresh = jnp.asarray(np.asarray(threshs,
                                        dtype=_real_base(p.dtype)))
        tapes = self._proto.tapes
        batched = jax.jit(jax.vmap(core, in_axes=(0, 0, None)))
        with self.stat.phase("FACT"):
            pool_b, linv_b, uinv_b, tiny = batched(pool_b, thresh, tapes)
            pool_b.block_until_ready()
        self.pool_b = pool_b
        self.linv_b = linv_b
        self.uinv_b = uinv_b
        self.stat.tiny_pivots += int(np.sum(np.asarray(tiny)))
        self._solve_batched = {}
        self._As = [sp.csc_matrix(A) for A in As]

    def _pool_values(self, A, R, C):
        """Per-matrix scaled/permuted values scattered into a fresh pool
        (SamePattern_SameRowPerm semantics across the batch)."""
        p = self._proto
        A3 = sp.csc_matrix(A).multiply(np.asarray(R)[:, None]) \
            .multiply(np.asarray(C)[None, :]).tocsc()
        A3 = A3[p.rowperm, :][p.colperm, :][:, p.colperm]
        # the proto plan was built on the expanded matrix (etree-aligned
        # blocks): replicate its expansion so init_idx ordering matches
        A3 = p._expand_A(sp.csc_matrix(A3))
        return _blocklu.init_pool(p.plan, sp.csc_matrix(A3).data, p.dtype)

    def solve(self, Bs) -> np.ndarray:
        """Bs: (count, n) or (count, n, nrhs) → same-shape solutions."""
        p = self._proto
        B = np.asarray(Bs)
        squeeze = B.ndim == 2
        if squeeze:
            B = B[:, :, None]
        nrhs = B.shape[2]
        prc = p.rowperm[p.colperm]
        rows = p._bpad_rows()
        bp = np.zeros((self.count, rows, nrhs), dtype=p.dtype)
        bp[:, p._rows_idx] = self.row_scales[:, prc, None] * B[:, prc]
        if nrhs not in self._solve_batched:
            core = _blocklu.build_solve_core(self.plan, nrhs,
                                             chunk=self.options.gemm_chunk)
            self._solve_batched[nrhs] = jax.jit(
                jax.vmap(core, in_axes=(0, 0, 0, None, None, 0)))
        y = np.asarray(self._solve_batched[nrhs](
            self.pool_b, self.linv_b, self.uinv_b, p.ltape, p.utape,
            jnp.asarray(bp)))[:, p._rows_idx]
        x = np.empty((self.count, self.n, nrhs), dtype=y.dtype)
        x[:, p.colperm] = self.col_scales[:, p.colperm, None] * y
        return x[:, :, 0] if squeeze else x

    def refine(self, Bs, X0) -> tuple:
        """Per-matrix iterative refinement (host loop over the batch for the
        residuals; solves stay batched)."""
        from ..utils.testing import backward_error
        B = np.asarray(Bs, dtype=np.float64) \
            if np.asarray(Bs).dtype.kind != "c" else np.asarray(Bs)
        X = np.asarray(X0, dtype=self._proto.refine_dtype)
        berr = np.zeros(self.count)
        for it in range(self.options.max_refine_steps):
            R = np.stack([self._As[i] @ X[i] for i in range(self.count)])
            R = B - R
            berr = np.array([
                backward_error(self._As[i], X[i], B[i])
                for i in range(self.count)])
            eps = np.finfo(np.float64).eps
            if np.all(berr <= eps * 4):
                break
            dX = self.solve(R.astype(self._proto.dtype))
            X = X + dX
            self.stat.refine_steps = it + 1
        return X, berr


def gssvx_batch(As: Sequence[sp.spmatrix], Bs: Sequence[np.ndarray],
                options: Optional[Options] = None, grid=None):
    """Heterogeneous batch via a block-diagonal composite system.

    Per-matrix preprocessing (equilibration → MC64 → fill-reducing
    ordering) runs first so the composite needs no further permutation
    (options fact/ordering axes mirror pdgssvx3d_csc_batch.c:110-217).
    ``grid`` (Grid2D or Grid3D) factors the composite on a device mesh —
    the reference's batch interface runs through pdgssvx3d the same way
    (pdgssvx3d_csc_batch.c:80-503). Returns a list of SolveResult.
    """
    options = options or Options()
    count = len(As)
    if count != len(Bs):
        raise ValueError("len(As) != len(Bs)")

    pre = []
    for A, b in zip(As, Bs):
        A = sp.csc_matrix(A)
        n = A.shape[0]
        if options.equil == Equil.YES:
            A1, R, C, _ = _equil.equilibrate(A)
        else:
            A1, R, C = A, np.ones(n), np.ones(n)
        if options.row_perm in (RowPerm.LARGE_DIAG_MC64,
                                RowPerm.LARGE_DIAG_HWPM):
            rp, R1, C1 = _mc64.ldperm(A1, job=5)
            A1 = A1.multiply(R1[:, None]).multiply(C1[None, :]).tocsc()
            R, C = R1 * R, C * C1
        else:
            rp = np.arange(n, dtype=np.int64)
        A2 = sp.csc_matrix(A1)[rp, :]
        if options.col_perm == ColPerm.NATURAL:
            pc = np.arange(n, dtype=np.int64)
        else:
            pc = _ordering.get_perm_c(options.col_perm, A2)
        A3 = A2[pc, :][:, pc]
        pre.append((A, np.asarray(b), R, C, rp, pc, sp.csc_matrix(A3)))

    A_big = sp.block_diag([p[6] for p in pre], format="csc")
    composite_opts = options.replace(
        equil=Equil.NO, row_perm=RowPerm.NOROWPERM,
        col_perm=ColPerm.NATURAL, iter_refine=IterRefine.NOREFINE)
    if grid is None:
        lu = SparseLU(A_big, composite_opts)
    else:
        from ..parallel.grid import Grid3D
        if isinstance(grid, Grid3D):
            from .driver3d import Distributed3DSparseLU
            lu = Distributed3DSparseLU(A_big, grid, composite_opts)
        else:
            from .dist_driver import DistributedSparseLU
            lu = DistributedSparseLU(A_big, grid, composite_opts)

    from ..utils.testing import backward_error

    offs = np.cumsum([0] + [p[0].shape[0] for p in pre])
    nrhs = max(p[1].shape[1] if p[1].ndim == 2 else 1 for p in pre)
    rdtype = np.complex128 if any(p[0].dtype.kind == "c" for p in pre) \
        else np.float64

    def to_big(vecs):
        """Per-matrix RHS → composite RHS in preprocessed coordinates."""
        big = np.zeros((A_big.shape[0], nrhs), dtype=rdtype)
        for i, (A, _, R, C, rp, pc, _) in enumerate(pre):
            v = vecs[i]
            prc = rp[pc]
            big[offs[i]:offs[i + 1], : v.shape[1]] = R[prc, None] * v[prc]
        return big

    def from_big(y_big):
        out = []
        for i, (A, _, R, C, rp, pc, _) in enumerate(pre):
            n = A.shape[0]
            y = y_big[offs[i]:offs[i + 1]]
            x = np.empty((n, nrhs), dtype=y.dtype)
            x[pc] = C[pc, None] * y
            out.append(x)
        return out

    Bcols = [p[1] if p[1].ndim == 2 else p[1][:, None] for p in pre]
    Xs = [x.astype(rdtype) for x in
          from_big(lu.solve(to_big(Bcols)).astype(rdtype))]

    steps = 0
    if options.iter_refine != IterRefine.NOREFINE:
        for it in range(options.max_refine_steps):
            Rs = [Bcols[i] - pre[i][0] @ Xs[i] for i in range(count)]
            berrs = [max(backward_error(pre[i][0], Xs[i][:, j],
                                        Bcols[i][:, j])
                         for j in range(Bcols[i].shape[1]))
                     for i in range(count)]
            if max(berrs) <= np.finfo(np.float64).eps * 4:
                break
            dXs = from_big(lu.solve(to_big(Rs)).astype(rdtype))
            Xs = [Xs[i] + dXs[i] for i in range(count)]
            steps = it + 1

    results: List[SolveResult] = []
    for i, (A, b, *_rest) in enumerate(pre):
        x = Xs[i][:, : Bcols[i].shape[1]]
        berr_final = np.array([backward_error(A, x[:, j], Bcols[i][:, j])
                               for j in range(Bcols[i].shape[1])])
        stat = Stats()
        stat.refine_steps = steps
        results.append(SolveResult(
            x=x[:, 0] if b.ndim == 1 else x, berr=berr_final, stat=stat))
    return results, lu
