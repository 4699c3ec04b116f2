"""Expert driver: the ``pdgssvx`` analog.

Pipeline (mirrors reference: SRC/double/pdgssvx.c:506-2783):
  equilibrate → static row pivot (MC64) → fill-reducing column order →
  block symbolic (static schedule) → device factorization → triangular
  solves → iterative refinement, with factor-reuse staging
  (DOFACT / SamePattern / SamePattern_SameRowPerm / FACTORED,
  superlu_defs.h:545-566) and per-phase statistics (PStatPrint analog).

The factored operator satisfies  Pc·Pr·Dr·A·Dc·Pcᵀ = L·U  exactly as in the
reference (pdgssvx.c "What is performed" comment block): row scaling Dr,
column scaling Dc, MC64 row permutation Pr, and the fill-reducing column
permutation Pc applied symmetrically so the matched diagonal stays on the
diagonal.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from ..utils.options import (ColPerm, DiagScale, Equil, Fact, IterRefine,
                             Options, RowPerm, Trans)
from ..utils.stats import Stats
from ..ops.host import equil as _equil
from ..ops.host import mc64 as _mc64
from ..ops.host import ordering as _ordering
from ..ops.host.symbolic import block_symbolic
from ..ops.kernels import blocklu as _blocklu
from ..ops.kernels import spmv as _spmv
from ..utils.testing import langs

_DTYPES = {
    "float32": np.float32, "float64": np.float64,
    "complex64": np.complex64, "complex128": np.complex128,
}

_REFINE_DTYPES = {
    "float32": np.float64, "float64": np.float64,
    "complex64": np.complex128, "complex128": np.complex128,
}


def _resolve_refine_dtype(options) -> np.dtype:
    """Residual dtype for iterative refinement.

    SLU_DOUBLE promotes to double width (psgssvx_d2 mixed precision);
    SLU_SINGLE keeps the working precision (the psgssvx path where the
    residual is computed in the factorization precision). An explicit
    ``options.refine_dtype`` always wins."""
    if options.refine_dtype:
        return np.dtype(options.refine_dtype)
    if options.iter_refine == IterRefine.SLU_SINGLE:
        return np.dtype(_DTYPES[options.dtype])
    return np.dtype(_REFINE_DTYPES[options.dtype])


def _real_base(dtype) -> np.dtype:
    d = np.dtype(dtype)
    if d.kind == "c":
        return np.dtype(np.float32) if d.itemsize == 8 else np.dtype(np.float64)
    return d


def _real_eps(dtype) -> float:
    return float(np.finfo(_real_base(dtype)).eps)


_EMBED_RE = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
_EMBED_IM = np.array([[0.0, -1.0], [1.0, 0.0]], dtype=np.float32)


def _embed_csc(A: sp.spmatrix) -> sp.csc_matrix:
    """Real ring embedding of a complex matrix: each entry a+bi becomes
    the 2x2 block [[a,-b],[b,a]] (rows interleaved re,im). A ring
    homomorphism, so LU(embed(A)) = embed(LU(A)) exactly."""
    A = sp.csc_matrix(A)
    return (sp.kron(A.real, _EMBED_RE, format="csc")
            + sp.kron(A.imag.astype(np.float32), _EMBED_IM,
                      format="csc")).astype(np.float32)


def _embed_rhs(v: np.ndarray) -> np.ndarray:
    """(n, k) complex -> (2n, k) interleaved real."""
    out = np.empty((2 * v.shape[0],) + v.shape[1:], dtype=np.float32)
    out[0::2] = v.real
    out[1::2] = v.imag
    return out


def _unembed_sol(y: np.ndarray) -> np.ndarray:
    return y[0::2] + 1j * y[1::2]


def _check_user_perm(p, n: int, what: str) -> np.ndarray:
    """Validate a user-supplied permutation (check_perm_dist analog)."""
    p = np.asarray(p, dtype=np.int64)
    if p.shape != (n,) or len(np.unique(p)) != n or p.min() < 0 \
            or p.max() >= n:
        raise ValueError(
            f"{what} must be a permutation of 0..{n - 1} (got shape "
            f"{p.shape})")
    return p


def _perm_sign(perm: np.ndarray) -> float:
    """Permutation parity via cycle counting."""
    n = len(perm)
    seen = np.zeros(n, dtype=bool)
    sign = 1.0
    for i in range(n):
        if seen[i]:
            continue
        j = i
        clen = 0
        while not seen[j]:
            seen[j] = True
            j = int(perm[j])
            clen += 1
        if clen % 2 == 0:
            sign = -sign
    return sign


@dataclasses.dataclass
class SolveResult:
    x: np.ndarray
    berr: np.ndarray          # componentwise backward error per RHS
    stat: Stats
    info: int = 0
    rcond: Optional[float] = None   # 1-norm reciprocal condition estimate


class SparseLU:
    """Factorized sparse operator (LUstruct + ScalePermstruct analog).

    Holds everything needed for repeated solves and the reuse modes:
    scalings (Dr, Dc), permutations (Pr, Pc), the symbolic plan (static
    device schedule), and the factored block pool + diagonal inverses.
    """

    def __init__(self, A, options: Optional[Options] = None,
                 stat: Optional[Stats] = None):
        from ..utils.options import apply_env_overrides
        self.options = apply_env_overrides(options or Options())
        self.stat = stat or Stats()
        A = self._ingest_input(A)
        A = sp.csc_matrix(A)
        if A.shape[0] != A.shape[1]:
            raise ValueError("SparseLU requires a square matrix")
        self.n = A.shape[0]
        self.dtype = np.dtype(_DTYPES[self.options.dtype])
        self.refine_dtype = _resolve_refine_dtype(self.options)
        self.plan = None
        self._solve_fns = {}
        self._factor(A, fact=self.options.fact)

    # ------------------------------------------------------------------
    # preprocessing + factorization
    # ------------------------------------------------------------------

    def _ingest_input(self, A):
        """Input normalization hook. The single-chip driver gathers
        NRLoc chunks host-side (dGatherNRformat_loc3d role); the
        distributed drivers override to keep partial input sharded."""
        from ..utils.nrloc import NRLocMatrix
        if isinstance(A, NRLocMatrix):
            return A.to_global()
        return A

    def _preprocess(self, A: sp.spmatrix, reuse_perms: bool,
                    reuse_colperm: bool) -> sp.csc_matrix:
        opts, stat = self.options, self.stat
        n = self.n

        if reuse_perms:
            # SamePattern_SameRowPerm: reuse Dr/Dc/Pr/Pc wholesale
            A3 = A.multiply(self.row_scale[:, None]) \
                  .multiply(self.col_scale[None, :]).tocsc()
            A3 = A3[self.rowperm, :][self.colperm, :][:, self.colperm]
            return self._expand_A(sp.csc_matrix(A3))

        # ---- equilibration (pdgsequ/pdlaqgs) ----
        with stat.phase("EQUIL"):
            if opts.equil == Equil.YES:
                A1, R, C, equed = _equil.equilibrate(A)
            else:
                A1, R, C = A, np.ones(n), np.ones(n)
                equed = DiagScale.NOEQUIL
        self.equed = equed

        # ---- static row pivoting (dldperm job 5) ----
        with stat.phase("ROWPERM"):
            if opts.row_perm == RowPerm.LARGE_DIAG_HWPM:
                # parallel heavy-weight perfect matching (auction;
                # native/hwpm.cpp). Like the reference's CombBLAS path
                # (d_c2cpp_GetHWPM.cpp:55, pdgssvx.c RowPerm==LargeDiag_HWPM)
                # this applies NO R1/C1 scalings — permutation only.
                rowperm = _mc64.hwpm_rowperm(A1)
            elif opts.row_perm == RowPerm.LARGE_DIAG_MC64:
                rowperm, R1, C1 = _mc64.ldperm(A1, job=5)
                # fold MC64 scalings into Dr/Dc (pdgssvx.c job==5 path)
                A1 = A1.multiply(R1[:, None]).multiply(C1[None, :]).tocsc()
                R = R1 * R
                C = C * C1
            elif opts.row_perm == RowPerm.MY_PERMR:
                rowperm = (_check_user_perm(opts.user_rowperm, n,
                                            "user_rowperm")
                           if opts.user_rowperm is not None
                           else self.rowperm)
            else:
                rowperm = np.arange(n, dtype=np.int64)
        A2 = sp.csc_matrix(A1)[rowperm, :]

        # ---- fill-reducing column ordering (get_perm_c) ----
        with stat.phase("COLPERM"):
            if opts.col_perm == ColPerm.MY_PERMC and \
                    opts.user_colperm is not None:
                pc = _check_user_perm(opts.user_colperm, n, "user_colperm")
            elif reuse_colperm or opts.col_perm == ColPerm.MY_PERMC:
                pc = self.colperm
            else:
                pc = _ordering.get_perm_c(opts.col_perm, A2)
        A3 = A2[pc, :][:, pc]

        self.row_scale = np.asarray(R)
        self.col_scale = np.asarray(C)
        self.rowperm = np.asarray(rowperm, dtype=np.int64)
        self.colperm = np.asarray(pc, dtype=np.int64)
        A3 = sp.csc_matrix(A3)
        if reuse_colperm:
            # SamePattern: the stored colperm already folds in the
            # alignment postorder; reapply the stored expansion.
            return self._expand_A(A3)
        return self._align_blocks(A3)

    # -- etree-aligned block boundaries (ops/host/align.py) --------------

    def _effective_bs(self) -> int:
        """Block width in *matrix* columns: the real ring embedding packs
        two embedded columns per complex column, so alignment must target
        half the device block width for complex64."""
        return self.options.block_size // (2 if self._embed else 1)

    def _align_standdown(self) -> bool:
        """In ``align_blocks="auto"`` mode, alignment stands down on the
        single-chip fused-Pallas path: the fused kernels (clk/tck/flk)
        stream columns serially inside one kernel, so the level-schedule
        parallelism alignment buys is unusable there while its padding
        costs real work (measured round 3: lap3d20 96 → 50.8 useful GF/s,
        pad 8.5 → 14.2×). The distributed/3D drivers override this to
        False — their level-batched executors are exactly what alignment
        exists for. Mirrors the reference, where the supernodal-etree
        schedule is consulted only by the parallel factorization
        (dstatic_schedule.c:46) while panel kernels stay dense."""
        import os
        import jax
        opts = self.options
        # the stand-down only pays while clk (VMEM-resident columns) can
        # run — roughly n ≤ 50k for 3D-Laplacian-class fill. Above that
        # the tall-column executors profit enormously from alignment:
        # measured lap3d50 n=125k single chip, aligned vs not —
        # factor 85.9 ms / 2131 GF/s vs 406 ms / 451 GF/s (3.5x less
        # block fill), solve 15.2 ms vs 75.2 ms; and at n=885k the
        # unaligned XLA plan needs 47 GiB while the aligned run fits.
        if self.n > int(os.environ.get("SLU_TPU_ALIGN_STANDDOWN_MAX",
                                       50_000)):
            return False
        if self._fdtype != np.dtype(np.float32):
            return False
        if (opts.executor or "clk") not in ("clk", "tck", "flk"):
            return False
        force = os.environ.get("SLU_TPU_FORCE_PALLAS", "")
        if force == "off":
            return False
        if force == "interpret":
            return True
        return (opts.block_size == 128
                and jax.devices()[0].platform == "tpu")

    def _align_blocks(self, A3: sp.csc_matrix) -> sp.csc_matrix:
        """Postorder + expand ``A3`` so block boundaries follow the etree
        (recovers the supernodal-etree schedule parallelism; reference:
        supernodal_etree.c topological levels, sp_colorder.c postorder)."""
        from ..ops.host import align as _align
        opts, stat = self.options, self.stat
        self._expand = None
        self._n_e = None
        mode = (opts.align_blocks or "auto").lower()
        bs = self._effective_bs()
        if mode == "off" or bs < 2:
            return A3
        if mode == "auto" and self._align_standdown():
            return A3
        with stat.phase("COLPERM"):
            res = _align.aligned_blocking(
                A3, bs,
                max_inflate=(np.inf if mode == "on"
                             else opts.align_max_inflate))
        if res is None:
            return A3
        A3 = A3[res.po, :][:, res.po]
        self.colperm = self.colperm[res.po]
        self._expand = res.expand
        self._n_e = res.n_e
        stat.counters["align_inflate"] = round(res.n_e / self.n, 3)
        stat.counters["align_blocks"] = res.n_blocks
        return _align.expand_matrix(A3, res.expand, res.n_e)

    def _expand_A(self, A3: sp.csc_matrix) -> sp.csc_matrix:
        """Reapply a stored expansion (factor-reuse modes)."""
        if getattr(self, "_expand", None) is None:
            return A3
        from ..ops.host import align as _align
        return _align.expand_matrix(A3, self._expand, self._n_e)

    def _factor(self, A: sp.spmatrix, fact: Fact):
        opts, stat = self.options, self.stat
        if fact == Fact.FACTORED:
            raise ValueError("FACTORED requires an existing factorization")

        reuse_perms = fact == Fact.SAME_PATTERN_SAME_ROWPERM
        reuse_colperm = fact == Fact.SAME_PATTERN or reuse_perms
        if reuse_colperm and self.plan is None and not hasattr(self, "colperm"):
            raise ValueError(f"{fact} requested but no prior factorization")
        self._A_orig = A
        # the embedding decision shapes the alignment pass (block width in
        # complex columns), so resolve it before preprocessing
        self._embed = self._use_embed()
        A3 = self._preprocess(A, reuse_perms, reuse_colperm)
        # sharded-input processes receive the global norm via broadcast
        # (their A3 view is partial/absent)
        if getattr(self, "_anorm_global", None) is not None:
            self._anorm = self._anorm_global
        else:
            self._anorm = float(np.abs(A3.data).max()) if A3.nnz else 1.0

        # complex64 on TPU: factor the real ring embedding a+bi ->
        # [[a,-b],[b,a]] (interleaved 2x2 blocks) so the complex
        # factorization runs the SAME fused f32 Pallas kernels — the
        # embedding is a ring homomorphism, so LU(embed(A)) = embed(LU(A))
        # exactly, at the complex op count (4 real mults per complex
        # mult). The planar (re,im)-planes executor remains for CPU/XLA
        # (2x less memory); force with SLU_TPU_COMPLEX=planar|embed.
        # Reference parity: the z precision suite (SRC/complex16/).
        if self._embed:
            A3 = _embed_csc(A3)

        with stat.phase("SYMBFAC"):
            if reuse_perms and self.plan is not None:
                plan = self.plan
            else:
                plan = self._symbolic(A3)
                A3, plan = self._adapt_plan(A3, plan)
                self._solve_fns.clear()
                # transpose-solve tapes are plan/perm-derived and cached
                # behind hasattr guards — drop them with the plan, or a
                # SAME_PATTERN refactor that changes the row permutation
                # silently solves Aᵀ against stale schedules (caught by
                # review: err 7e4 while NOTRANS stayed 5e-12)
                for attr in ("ttape_u", "ttape_l", "_ttapes", "tplan"):
                    if hasattr(self, attr):
                        delattr(self, attr)
        # device row indices where the n (or 2n embedded) RHS rows land:
        # identity without alignment, the expansion map with it (computed
        # after symbolic — the adaptive policy may swap the expansion)
        base = self._expand if getattr(self, "_expand", None) is not None \
            else np.arange(self.n, dtype=np.int64)
        if self._embed:
            ri = np.empty(2 * len(base), dtype=np.int64)
            ri[0::2] = 2 * base
            ri[1::2] = 2 * base + 1
            self._rows_idx = ri
        else:
            self._rows_idx = base

        self.plan = plan
        stat.counters["fill_blocks"] = plan.nslots
        stat.counters["factor_flops_model"] = plan.factor_flops
        from ..utils.profiling import record_schedule_counters
        record_schedule_counters(stat, plan)   # SCT per-level analog
        stat.peak_buffer_bytes = max(stat.peak_buffer_bytes,
                                     plan.pool_bytes(self._fdtype))

        # epoch counter: lets cached per-nrhs closures (the distributed
        # fused refine) detect a refactor and re-capture value state
        self._factor_epoch = getattr(self, "_factor_epoch", 0) + 1
        self._device_factor(A3)
        stat.ops["FACT"] += plan.factor_flops

        # singularity detection (pdgstrf info>0 contract): with tiny-pivot
        # replacement off, an exactly-singular leading minor produces a
        # zero/non-finite U diagonal entry; report its 1-based index.
        self.info = 0
        if not opts.replace_tiny_pivot:
            du = self.diag_u()
            bad = np.flatnonzero(~np.isfinite(du) | (du == 0))
            if len(bad):
                self.info = int(bad[0]) + 1

        # env-gated factorization audits (reference: the CHECKLU and
        # WRITELU/LUFILE debug hooks, SRC env catalog): CHECKLU verifies
        # L·U against the permuted/scaled A and records the max block
        # residual; WRITELU dumps the factor pool for offline comparison.
        import os as _env_os
        if _env_os.environ.get("SLU_TPU_CHECKLU", "") == "1":
            from ..utils import debug as _debug
            stat.counters["checklu_max_resid"] = float(
                _debug.check_factorization(self, A3))
        wl = _env_os.environ.get("SLU_TPU_WRITELU", "")
        if wl:
            from ..utils import debug as _debug
            _debug.dump_lu(self, wl)

        # COO of the original A for refinement residuals (mixed precision).
        # Complex matrices keep the residual COO in planar (re, im) real
        # arrays on BOTH complex paths: the TPU backend cannot device_put a
        # complex array at all, so the embed path must use the planar
        # residual machinery too.
        if self._use_planar() or self._embed:
            rdt = _real_base(self.refine_dtype)
            self._coo_ref = _spmv.coo_arrays_planar(A, jnp.dtype(rdt))
            vr, vi = self._coo_ref[2]
            self._coo_abs = jnp.sqrt(vr * vr + vi * vi)
        else:
            self._coo_ref = _spmv.coo_arrays(A, jnp.dtype(self.refine_dtype))

    def _symbolic(self, A3: sp.csc_matrix):
        """Symbolic factorization hook (the distributed drivers override
        this with a preprocess-once-then-broadcast multi-host version)."""
        return block_symbolic(A3, self.options.block_size,
                              ilu_level=self.options.ilu_level)

    #: distributed drivers plan on process 0 and broadcast — the adaptive
    #: retry loop must not run there (divergent decisions across processes)
    _adapt_ok = True

    def _eval_candidate(self, A2: sp.csc_matrix, pc: np.ndarray, bs: int,
                        tag: str, flops_cap: float | None = None) -> dict:
        """Build one candidate plan (ordering ``pc`` at block size ``bs``)
        without mutating driver state; returns a scoring record.

        ``flops_cap``: cheap GNP pre-filter — a candidate whose scalar
        flop ESTIMATE already exceeds the cap cannot win, and running the
        full fill simulation on it can cost tens of GB of host RAM
        (measured: a COLAMD candidate at n=885k OOM-killed the process
        before this guard existed). Returns ``{"skipped": True}``."""
        from ..ops.host import align as _align
        from ..ops.host.colcounts import estimate_gesp_stats
        A3 = sp.csc_matrix(A2[pc, :][:, pc])
        if flops_cap is not None:
            pre = estimate_gesp_stats(A3)
            if pre["flops"] > flops_cap:
                return dict(tag=tag, skipped=True)
        colperm, expand, n_e = pc, None, None
        mode = (self.options.align_blocks or "auto").lower()
        if mode != "off" and bs >= 2 and \
                not (mode == "auto" and self._align_standdown()):
            res = _align.aligned_blocking(
                A3, bs, max_inflate=(np.inf if mode == "on"
                                     else self.options.align_max_inflate))
            if res is not None:
                A3 = A3[res.po, :][:, res.po]
                colperm = pc[res.po]
                expand, n_e = res.expand, res.n_e
                A3 = _align.expand_matrix(A3, expand, n_e)
        plan = block_symbolic(A3, bs, ilu_level=self.options.ilu_level)
        est = estimate_gesp_stats(A3)
        return dict(tag=tag, A3=A3, plan=plan, colperm=colperm,
                    expand=expand, n_e=n_e,
                    pool=plan.pool_bytes(self._fdtype),
                    pad=plan.factor_flops / est["flops"])

    def _adapt_plan(self, A3: sp.csc_matrix, plan):
        """Adaptive plan policy: guard against pathological pad ratios and
        HBM overruns on irregular matrices.

        Fixed B×B blocking can explode on irregular supernode
        distributions (measured: big.rua pad 482× under the default
        ordering). When the plan's flop pad vs the Gilbert–Ng–Peyton
        scalar estimate exceeds ``adapt_pad_max`` — or the pool exceeds
        ``hbm_budget_gb`` — retry the other fill-reducing orderings (the
        get_perm_c dispatch set, reference: get_perm_c.c:500-546) and,
        for budget overruns, smaller block sizes, keeping the cheapest
        plan. Every decision lands in ``stat.counters['adapt_*']``; the
        reference instead relies on variable-width supernodes
        (symbfact.c relax_snode) so pad cannot occur there.
        """
        import time as _time
        opts, stat = self.options, self.stat
        if (opts.adapt_policy or "auto") == "off" or not self._adapt_ok:
            return A3, plan
        if self._embed or self._use_planar() or \
                np.dtype(self.dtype).kind == "c":
            return A3, plan
        if getattr(self, "_anorm_global", None) is not None:
            return A3, plan           # sharded input: no global A here
        budget = opts.hbm_budget_gb * 2**30
        pool = plan.pool_bytes(self._fdtype)
        # cheap proxy first: pool entries per A nonzero (no colcounts run)
        proxy = plan.nslots * plan.bs * plan.bs / max(self._A_orig.nnz, 1)
        if pool <= budget and proxy <= opts.adapt_pad_max:
            return A3, plan
        t0 = _time.perf_counter()
        from ..ops.host import ordering as _ordering
        from ..ops.host.colcounts import estimate_gesp_stats
        est = estimate_gesp_stats(A3)
        pad0 = plan.factor_flops / est["flops"]
        stat.counters["adapt_pad_est"] = round(pad0, 1)
        if pool <= budget and pad0 <= opts.adapt_pad_max:
            stat.counters["adapt_check_s"] = round(
                _time.perf_counter() - t0, 2)
            return A3, plan           # proxy fired; honest pad is fine
        # rebuild the pre-colperm matrix (equilibrated + row-permuted)
        A2 = sp.csc_matrix(
            self._A_orig.multiply(self.row_scale[:, None])
            .multiply(self.col_scale[None, :]))[self.rowperm, :].tocsc()
        cur = dict(tag="current", A3=A3, plan=plan, colperm=self.colperm,
                   expand=getattr(self, "_expand", None),
                   n_e=getattr(self, "_n_e", None), pool=pool, pad=pad0)
        cands = [cur]
        for strat in (ColPerm.METIS_AT_PLUS_A, ColPerm.COLAMD,
                      ColPerm.MMD_AT_PLUS_A):
            if strat == opts.col_perm:
                continue
            try:
                pc = _ordering.get_perm_c(strat, A2)
                rec = self._eval_candidate(A2, pc, plan.bs, strat.name,
                                           flops_cap=2.0 * est["flops"])
                if rec.get("skipped"):
                    stat.counters[f"adapt_skip_{strat.name}"] = 1
                else:
                    cands.append(rec)
            except Exception as e:        # a candidate failing is logged,
                stat.counters[f"adapt_fail_{strat.name}"] = repr(e)

        def score(rec):
            # fitting the budget dominates; then least device work
            return (rec["pool"] > budget, rec["plan"].factor_flops)

        best = min(cands, key=score)
        # still over budget: shrink the block size on the best ordering
        # (bs<128 runs the XLA executor — capacity over speed)
        if best["pool"] > budget:
            for bs in (64, 32):
                try:
                    # best["colperm"] already folds any alignment
                    # postorder — itself a legal fill-preserving ordering
                    rec = self._eval_candidate(
                        A2, np.asarray(best["colperm"]), bs,
                        f"{best['tag']}_bs{bs}")
                except Exception as e:
                    stat.counters[f"adapt_fail_bs{bs}"] = repr(e)
                    continue
                cands.append(rec)
                if rec["pool"] <= budget:
                    break
            best = min(cands, key=score)
        stat.counters["adapt_tried"] = ",".join(
            f"{r['tag']}:pad={r['pad']:.0f}:pool={r['pool']/2**30:.2f}G"
            for r in cands)
        stat.counters["adapt_check_s"] = round(_time.perf_counter() - t0, 2)
        if best is cur:
            stat.counters["adapt_chosen"] = "current"
            return A3, plan
        self.colperm = np.asarray(best["colperm"], dtype=np.int64)
        self._expand, self._n_e = best["expand"], best["n_e"]
        if best["plan"].bs != plan.bs:
            self.options = opts.replace(block_size=best["plan"].bs)
        stat.counters["adapt_chosen"] = best["tag"]
        return best["A3"], best["plan"]

    def _thresh(self) -> float:
        return (np.sqrt(_real_eps(self.dtype)) * self._anorm
                if self.options.replace_tiny_pivot else 0.0)

    def _pallas_solve_rows_ok(self) -> bool:
        """The fused Pallas solve pads RHS lanes to W=128: two
        (rows_pad, 128) f32 buffers ≈ 1.1 GiB at n=885k — 19 MiB past
        HBM next to the 13.4 GiB capacity pool (measured). Above the row
        cap the per-level XLA sweep (exact-width RHS) serves instead."""
        import os
        return self._bpad_rows() <= int(os.environ.get(
            "SLU_TPU_PALLAS_SOLVE_MAX_ROWS", 500_000))

    def _pallas_solve_ok(self) -> bool:
        """The fused whole-sweep solve kernel prefetches its window tapes
        into SMEM; streams larger than one segment are scanned as uniform
        SOLVE_SEG_WINDOWS chunks by a single compiled call (see
        pallas_exec._segment_sweep_tape), so every plan qualifies."""
        return True

    @property
    def _fdtype(self):
        """dtype of the device factor pool (float32 when embedding)."""
        return np.dtype(np.float32) if getattr(self, "_embed", False) \
            else self.dtype

    #: subclasses with their own complex executors (distributed drivers)
    #: opt out of the embedding
    _embed_ok = True

    #: True when _factor_fn takes a staged_values triple instead of a
    #: pre-built pool (the fused init+factor capacity path)
    _factor_takes_values = False

    def _use_embed(self) -> bool:
        """complex64 factors via the real ring embedding on accelerators
        (TPU has no complex dtype; the embedding reuses the fused f32
        kernels). complex128 keeps the planar executor: f32 embedding
        would halve its precision."""
        if not self._embed_ok:
            return False
        if np.dtype(self.dtype) != np.dtype(np.complex64):
            return False
        import os
        import jax
        mode = os.environ.get("SLU_TPU_COMPLEX", "")
        if mode == "planar":
            return False
        if mode == "embed":
            return True
        return jax.devices()[0].platform == "tpu"

    def _use_pallas(self) -> bool:
        """The Pallas path needs B=128 f32 on a real TPU (or interpret mode
        for tests via SLU_TPU_FORCE_PALLAS=interpret). Mosaic requires DMA
        block slices to be lane-aligned to 128, so sub-128 pools cannot
        compile on hardware (measured: bs=64 is rejected at memref_slice);
        interpret mode accepts any bs divisible by 8 for the flk executor.
        Smaller blocks are also a wall-clock loss on hardware: the fused
        kernel is per-op latency-bound (~2.5 TF/s padded vs ~100 TF/s MXU
        peak), so halving bs multiplies op count without saving time."""
        import os
        import jax
        force = os.environ.get("SLU_TPU_FORCE_PALLAS", "")
        if force == "off" or self.options.executor == "xla":
            return False
        if self._fdtype != np.dtype(np.float32):
            return False
        fused = (self.options.executor or "clk") in ("clk", "tck", "flk")
        if force == "interpret":
            return self.plan.bs % 8 == 0 if fused else self.plan.bs == 128
        if self.plan.bs != 128:
            return False
        return jax.devices()[0].platform == "tpu"

    def _use_planar(self) -> bool:
        """Complex matrices run as planar (re, im) real arithmetic on
        accelerators — the TPU backend has no complex dtype at all. On CPU
        the native complex executor is used (force with
        SLU_TPU_FORCE_PLANAR=1/0 for testing)."""
        if getattr(self, "_embed", False):
            return False
        if getattr(self, "_planar", None) is not None:
            return self._planar
        if np.dtype(self.dtype).kind != "c":
            return False
        import os
        import jax
        force = os.environ.get("SLU_TPU_FORCE_PLANAR", "")
        if force == "1":
            return True
        if force == "0":
            return False
        return jax.devices()[0].platform != "cpu"

    def _device_factor(self, A3: sp.csc_matrix):
        """Distribute values into the device pool and run the factorization
        (overridden by the mesh-distributed driver)."""
        import time as _time
        # Release any previous factorization FIRST: a refactor must not
        # hold the old multi-GiB pool while the new one initializes
        # (measured: n=512k refactor OOMs a 16 GiB chip otherwise). Same
        # in-place refactor discipline as the reference's
        # SamePattern_SameRowPerm path (pdgssvx.c re-uses LUstruct).
        self.pool = self.linv = self.uinv = None
        opts, stat, plan = self.options, self.stat, self.plan
        self._gemm_prec_used = "highest"   # fused branches lower this
        self._planar = self._use_planar()
        self._a3_data = np.asarray(A3.data)   # for profile_levels / reuse
        with stat.phase("DIST"):
            _t0 = _time.perf_counter()
            self.ltape = _blocklu.make_solve_tapes(plan, "L")
            self.utape = _blocklu.make_solve_tapes(plan, "U")
            stat.counters["dist_solve_tapes_s"] = round(
                _time.perf_counter() - _t0, 3)
            _t0 = _time.perf_counter()
            if self._planar:
                from ..ops.kernels import planar as _planar
                pool = _planar.init_pool_planar(plan, A3.data, self.dtype)
                self.tapes = _blocklu.make_factor_tapes(plan)
                self._factor_fn = _planar.build_factor_fn_planar(
                    plan, chunk=opts.gemm_chunk)
            elif self._use_pallas():
                import os
                pool = _blocklu.init_pool(plan, A3.data, self._fdtype)
                interp = (os.environ.get("SLU_TPU_FORCE_PALLAS", "")
                          == "interpret")
                exc = opts.executor or "clk"
                # Schur-GEMM pass precision (Options.gemm_precision):
                # "auto" factors with single-pass bf16 GEMMs (precision
                # "default"; Mosaic lowers only DEFAULT and HIGHEST) and
                # the refine() wrapper escalates to "highest" on stall —
                # the psgssvx_d2 pattern (psgssvx_d2.c:516-1584).
                # bf16-first only arms when refinement is configured:
                # a NOREFINE caller gets full-pass factors (their raw
                # solve is the final answer).
                req = opts.gemm_precision or "auto"
                if req == "auto":
                    # once this matrix class stalled and escalated, stay
                    # at "highest" for subsequent refactors — retrying
                    # bf16 would re-stall and pay the double factor again
                    req = ("highest" if getattr(self, "_prec_sticky", None)
                           else "bf16"
                           if opts.iter_refine != IterRefine.NOREFINE
                           else "highest")
                prec = getattr(self, "_prec_override", None) or \
                    {"bf16": "default", "default": "default"}.get(
                        req, "highest")
                self._gemm_prec_used = prec
                stat.counters["gemm_precision"] = prec
                if exc == "clk":
                    # column-resident left-looking kernel (clk.py): one
                    # A-range DMA + one wide matmul per source-column
                    # pair — the scalar-issue cost per GEMM collapses vs
                    # flk's 4 DMA descriptors each. Exact LU with a
                    # VMEM-sized column panel only; taller columns run
                    # the tiled variant (tck.py), ILU plans run flk.
                    from ..ops.kernels import clk as _clk
                    if opts.ilu_level is None and _clk.clk_supported(plan):
                        self._factor_fn, self.tapes = \
                            _clk.build_factor_fn_clk(plan, MC=opts.clk_mc,
                                                     interpret=interp,
                                                     precision=prec)
                        stat.counters["clk_jobs"] = sum(
                            len(s["j_fin"]) for s in self.tapes)
                        stat.counters["clk_segments"] = len(self.tapes)
                    else:
                        # columns taller than clk's VMEM panel (or ILU
                        # plans): flk when its window tapes fit SMEM
                        # (measured lap3d50 n=125k: flk 406 ms / 451
                        # GF/s vs tck 542 ms / 338 GF/s), else the XLA
                        # hybrid executor — the proven capacity path
                        # (n=885k in 14.5 of 16 GiB; every fused
                        # kernel's scalar tapes overflow SMEM there
                        # because one top elimination step spans the
                        # whole segment budget; the XLA executor also
                        # serves ILU plans). tck stays opt-in via
                        # executor="tck".
                        from ..ops.kernels import flk as _flkm
                        exc = ("flk"
                               if _flkm.flk_supported(plan, opts.flk_kc)
                               else "xla-fallback")
                if exc == "tck":
                    # sliding-tile column kernel: clk semantics for
                    # columns of any height (no PANEL_CAP limit)
                    from ..ops.kernels import tck as _tck
                    self._factor_fn, self.tapes = _tck.build_factor_fn_tck(
                        plan, interpret=interp, precision=prec)
                    stat.counters["tck_jobs"] = sum(
                        len(s["jt"]) for s in self.tapes)
                    stat.counters["tck_segments"] = len(self.tapes)
                if exc == "flk":
                    # fused left-looking single-call kernel (flk.py) —
                    # measured 1.1-2.4x the per-level hybrid and ~20x
                    # faster to compile (loop-based Mosaic kernel)
                    from ..ops.kernels import flk as _flk
                    self._factor_fn, self.tapes = _flk.build_factor_fn_flk(
                        plan, Kc=opts.flk_kc, interpret=interp,
                        precision=prec)
                    stat.counters["flk_windows"] = sum(
                        len(s["w_tgt"]) for s in self.tapes)
                    stat.counters["flk_segments"] = len(self.tapes)
                elif exc == "xla-fallback":
                    # fused kernels cannot segment this plan into SMEM:
                    # run the level-batched XLA hybrid (the capacity
                    # executor — no scalar-tape constraint; pass
                    # precision does not apply there)
                    self._gemm_prec_used = "highest"
                    stat.counters["gemm_precision"] = "highest"
                    self.tapes = _blocklu.make_factor_tapes(plan)
                    self._factor_fn = _blocklu.build_factor_fn(
                        plan, chunk=opts.gemm_chunk)
                    stat.counters["fused_fallback_xla"] = 1
                elif exc not in ("clk", "tck"):
                    from ..ops.kernels import pallas_exec as _pe
                    self._gemm_prec_used = "highest"
                    stat.counters["gemm_precision"] = "highest"
                    self._factor_fn, self.tapes = _pe.build_factor_fn_pallas(
                        plan, chunk=min(opts.gemm_chunk, 16),
                        interpret=interp)
            else:
                self.tapes = _blocklu.make_factor_tapes(plan)
                import os as _os
                # At B=128 the separated init_pool (3D device scatter) +
                # donated pool-input executor is copy-free: peak device
                # memory is ONE pool + linv/uinv — the SuiteSparse-scale
                # capacity path (n=885k factors in 14.5 of 16 GiB).
                # SLU_TPU_FUSED_INIT=1 opts into the fused single-dispatch
                # init+factor variant instead (see blocklu layout note).
                self._factor_takes_values = \
                    _os.environ.get("SLU_TPU_FUSED_INIT", "") == "1"
                if self._factor_takes_values:
                    pool = _blocklu.staged_values(plan, A3.data,
                                                  self._fdtype)
                    self._factor_fn = _blocklu.build_factor_values_fn(
                        plan, chunk=opts.gemm_chunk)
                else:
                    pool = _blocklu.init_pool(plan, A3.data, self._fdtype)
                    self._factor_fn = _blocklu.build_factor_fn(
                        plan, chunk=opts.gemm_chunk)
            stat.counters["dist_pool_and_build_s"] = round(
                _time.perf_counter() - _t0, 3)

        with stat.phase("FACT"):
            pool, linv, uinv, tiny = self._factor_fn(
                pool, jnp.asarray(self._thresh(),
                                  dtype=_real_base(self.dtype)),
                self.tapes)
            pool.block_until_ready()
        self.pool = pool
        self.linv = linv
        self.uinv = uinv
        stat.tiny_pivots += int(tiny)

    # ------------------------------------------------------------------
    # reuse modes
    # ------------------------------------------------------------------

    def refactor(self, A_new: sp.spmatrix,
                 fact: Fact = Fact.SAME_PATTERN_SAME_ROWPERM) -> "SparseLU":
        """Refactor a matrix with the same sparsity pattern.

        ``SAME_PATTERN_SAME_ROWPERM`` reuses perms + scalings + the whole
        symbolic plan (cheapest); ``SAME_PATTERN`` reuses only the column
        ordering and redoes equilibration/row pivoting.

        The previous factors are released BEFORE the new factorization
        starts (peak device memory stays ~one pool — required at capacity
        scale), so a refactor that fails midway (OOM, interrupt) leaves
        the instance without valid factors: subsequent solves raise a
        clear "factorization incomplete/released" error rather than
        silently using stale data. This diverges from the reference's
        SamePattern_SameRowPerm path, which keeps the old LUstruct alive
        on failure at the cost of double-resident factors.
        """
        if fact not in (Fact.SAME_PATTERN, Fact.SAME_PATTERN_SAME_ROWPERM):
            raise ValueError("refactor expects a SamePattern* mode")
        # re-ingest: NRLoc chunks re-gather/re-shard exactly as at
        # construction (the distributed drivers keep the new values local)
        A_new = self._ingest_input(A_new)
        self._factor(sp.csc_matrix(A_new), fact=fact)
        return self

    # ------------------------------------------------------------------
    # solves
    # ------------------------------------------------------------------

    def _require_factors(self):
        if getattr(self, "pool", None) is None:
            raise RuntimeError(
                "factorization incomplete or released (a refactor/"
                "profile run failed midway, or the factors were dropped "
                "for capacity) — refactor() before solving")

    def _solve_fn(self, nrhs: int):
        if nrhs not in self._solve_fns:
            self._solve_fns[nrhs] = _blocklu.build_solve_fn(
                self.plan, nrhs, chunk=self.options.gemm_chunk)
        return self._solve_fns[nrhs]

    def _bpad_rows(self) -> int:
        """Row count the solve executor expects (bucket-padded)."""
        from ..ops.kernels.blocklu import bucket125
        return bucket125(self.plan.nb) * self.plan.bs

    def _solve_factored(self, bp: np.ndarray) -> np.ndarray:
        """L U y = b in factorization coordinates; bp padded to
        _bpad_rows() rows. Overridden by the mesh-distributed drivers."""
        nrhs = bp.shape[1]
        if self._use_planar():
            from ..ops.kernels import planar as _planar
            key = ("C", nrhs)
            if key not in self._solve_fns:
                self._solve_fns[key] = _planar.build_solve_fn_planar(
                    self.plan, nrhs, chunk=self.options.gemm_chunk)
            b2 = jnp.asarray(np.stack([bp.real, bp.imag]).astype(
                _real_base(self.dtype)))
            y2 = self._solve_fns[key](self.pool, self.linv, self.uinv,
                                      self.ltape, self.utape, b2)
            return _planar.planar_to_complex(np.asarray(y2))
        if (self._use_pallas() and self._pallas_solve_ok()
                and self._pallas_solve_rows_ok()):
            import os
            from ..ops.kernels import pallas_exec as _pe
            key = ("P", nrhs)
            if key not in self._solve_fns:
                interp = (os.environ.get("SLU_TPU_FORCE_PALLAS", "")
                          == "interpret")
                self._solve_fns[key] = _pe.build_solve_fn_pallas_fused(
                    self.plan, nrhs, chunk=min(self.options.gemm_chunk, 16),
                    interpret=interp)
            fn, (tl, tu), W = self._solve_fns[key]
            wkey = ("PW", nrhs)
            if wkey not in self._solve_fns:
                import jax as _jax

                # pad/slice on device: shipping the W=128-padded RHS through
                # the host costs ~100x the payload on a remote TPU
                def wrapped(pool, linv, uinv, tl, tu, bsmall):
                    rows = bsmall.shape[0]
                    bw = jnp.zeros((rows, W), bsmall.dtype)
                    bw = bw.at[:, :nrhs].set(bsmall)
                    return fn(pool, linv, uinv, tl, tu, bw)[:, :nrhs]

                self._solve_fns[wkey] = _jax.jit(wrapped)
            y = np.asarray(self._solve_fns[wkey](
                self.pool, self.linv, self.uinv, tl, tu, jnp.asarray(bp)))
            return y
        return np.asarray(self._solve_fn(nrhs)(
            self.pool, self.linv, self.uinv, self.ltape, self.utape,
            jnp.asarray(bp)))

    def _trans_solve_fn(self, nrhs: int):
        key = ("T", nrhs)
        if key not in self._solve_fns:
            if not hasattr(self, "ttape_u"):
                self.ttape_u = _blocklu.make_trans_solve_tapes(self.plan, "U")
                self.ttape_l = _blocklu.make_trans_solve_tapes(self.plan, "L")
            self._solve_fns[key] = _blocklu.build_trans_solve_fn(
                self.plan, nrhs, chunk=self.options.gemm_chunk)
        return self._solve_fns[key]

    def solve_transposed(self, b, conj: bool = False) -> np.ndarray:
        """Solve Aᵀx = b (or Aᴴx = b) using the same factorization.

        Aᵀ = (Pc Pr Dr)ᵀ⁻¹ Uᵀ Lᵀ (Dc Pcᵀ)ᵀ⁻¹: a forward Uᵀ sweep then a
        backward Lᵀ sweep with transposed diagonal inverses. Aᴴ is solved
        through conjugation of b and x (the reference's trans_t branches).
        """
        self._require_factors()
        b = np.asarray(b)
        emb = getattr(self, "_embed", False)
        # the embedded pool's transpose solves Aᴴ natively
        # (embed(A)ᵀ = embed(Aᴴ)); the plain pool solves Aᵀ. The other
        # variant wraps conjugation around it (the trans_t branches).
        if conj != emb:
            return np.conj(self.solve_transposed(np.conj(b), conj=emb))
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        nrhs = b.shape[1]
        # Aᵀ x = b ⇒ A3ᵀ y = b3 with b3[k] = Dc[pc[k]]·b[pc[k]],
        # and x[prc[k]] = Dr[prc[k]]·y[k]
        bp = np.zeros((self._bpad_rows(), nrhs), dtype=self._fdtype)
        b3t = self.col_scale[self.colperm, None] * b[self.colperm]
        bp[self._rows_idx] = _embed_rhs(b3t) if emb else b3t
        with self.stat.phase("SOLVE"):
            if self._use_planar():
                from ..ops.kernels import planar as _planar
                key = ("CT", nrhs)
                if key not in self._solve_fns:
                    if not hasattr(self, "ttape_u"):
                        self.ttape_u = _blocklu.make_trans_solve_tapes(
                            self.plan, "U")
                        self.ttape_l = _blocklu.make_trans_solve_tapes(
                            self.plan, "L")
                    self._solve_fns[key] = _planar.build_trans_solve_fn_planar(
                        self.plan, nrhs, chunk=self.options.gemm_chunk)
                b2 = jnp.asarray(np.stack([bp.real, bp.imag]).astype(
                    _real_base(self.dtype)))
                y2 = self._solve_fns[key](self.pool, self.uinv, self.linv,
                                          self.ttape_u, self.ttape_l, b2)
                y = _planar.planar_to_complex(
                    np.asarray(y2))[self._rows_idx]
            else:
                y = np.asarray(self._trans_solve_fn(nrhs)(
                    self.pool, self.uinv, self.linv, self.ttape_u,
                    self.ttape_l, jnp.asarray(bp)))
                y = _unembed_sol(y[self._rows_idx]) if emb \
                    else y[self._rows_idx]
        prc = self.rowperm[self.colperm]
        x = np.empty((self.n, nrhs), dtype=y.dtype)
        x[prc] = self.row_scale[prc, None] * y
        return x[:, 0] if squeeze else x

    #: subclasses whose solve executor has a different signature
    #: (distributed drivers) keep the host transform path
    _device_solve_ok = True

    def _device_solve_fn(self, kb: int):
        """Fully-jitted b → x solve: Dr/Pr/Pc transforms, the triangular
        sweeps, and the back-transform all run in ONE device dispatch (the
        pdgstrs contract, reference: pdgstrs.c:1039 — B and X stay
        distributed; here they stay device-resident). ``kb`` is the padded
        RHS width; on the Pallas path the fused kernel pads its lanes to
        W=128 regardless, so one compilation serves every nrhs ≤ 128."""
        key = ("DEV", kb)
        if key in self._solve_fns:
            return self._solve_fns[key]
        import jax

        plan, n = self.plan, self.n
        fdt = jnp.dtype(self._fdtype)
        rows_pad = self._bpad_rows()
        # plan-specific arrays ride as OPERANDS, not closure constants:
        # baked-in perms/tapes made every matrix's solve HLO unique, which
        # defeated the persistent compile cache (measured: same-bucket
        # matrix paid a fresh ~95 s jit_dev_solve compile)
        ridx = jnp.asarray(self._rows_idx)
        prc = jnp.asarray(self.rowperm[self.colperm])
        pc = jnp.asarray(self.colperm)
        rs = jnp.asarray(self.row_scale[self.rowperm[self.colperm]],
                         dtype=fdt)
        cs = jnp.asarray(self.col_scale[self.colperm], dtype=fdt)

        if (self._use_pallas() and self._pallas_solve_ok()
                and self._pallas_solve_rows_ok()):
            import os
            from ..ops.kernels import pallas_exec as _pe
            interp = (os.environ.get("SLU_TPU_FORCE_PALLAS", "")
                      == "interpret")
            sfn, (tl, tu), W = _pe.build_solve_fn_pallas_fused(
                plan, kb, chunk=min(self.options.gemm_chunk, 16),
                interpret=interp)

            def solve_inner(pool, linv, uinv, bp, t1, t2):
                bw = jnp.zeros((rows_pad, W), fdt).at[:, :kb].set(bp)
                return sfn(pool, linv, uinv, t1, t2, bw)[:, :kb]
        else:
            core = _blocklu.build_solve_core(
                plan, kb, chunk=self.options.gemm_chunk)
            tl, tu = self.ltape, self.utape

            def solve_inner(pool, linv, uinv, bp, t1, t2):
                return core(pool, linv, uinv, t1, t2, bp)

        @jax.jit
        def dev_solve(pool, linv, uinv, b, ridx, prc, pc, rs, cs, t1, t2):
            bp = jnp.zeros((rows_pad, kb), fdt)
            bp = bp.at[ridx].set(rs[:, None] * b[prc])
            y = solve_inner(pool, linv, uinv, bp, t1, t2)[ridx]
            return jnp.zeros((n, kb), fdt).at[pc].set(cs[:, None] * y)

        def bound(pool, linv, uinv, b):
            return dev_solve(pool, linv, uinv, b, ridx, prc, pc, rs, cs,
                             tl, tu)

        self._solve_fns[key] = bound
        return bound

    def _device_solve_fn_cplx(self, kb: int):
        """Device-resident complex solve: one dispatch takes the stacked
        (2, n, kb) real planes of b and returns the planes of x — the
        transforms, the sweeps, and the back-transform all on device.
        Serves BOTH complex layouts (the ring-embedded f32 pool and the
        planar (re,im) pool); the host only splits/joins re+im. Without
        this, complex solves paid a host round-trip per transform
        (measured round 3: cg20 37.93 ms host-loop vs 2.48 ms sweep)."""
        key = ("DEVC", kb)
        if key in self._solve_fns:
            return self._solve_fns[key]
        import jax

        plan, n = self.plan, self.n
        rows_pad = self._bpad_rows()
        # plan-specific arrays as operands (see _device_solve_fn)
        prc = jnp.asarray(self.rowperm[self.colperm])
        pc = jnp.asarray(self.colperm)
        if self._use_planar():
            from ..ops.kernels import planar as _planar
            rdt = jnp.dtype(_real_base(self.dtype))
            rs = jnp.asarray(self.row_scale[self.rowperm[self.colperm]],
                             dtype=rdt)
            cs = jnp.asarray(self.col_scale[self.colperm], dtype=rdt)
            ridx = jnp.asarray(self._rows_idx)
            core = _planar.build_solve_core_planar(
                plan, kb, chunk=self.options.gemm_chunk)
            tl, tu = self.ltape, self.utape

            @jax.jit
            def dev_solve(pool, linv, uinv, b2, ridx, prc, pc, rs, cs,
                          t1, t2):
                bp = jnp.zeros((2, rows_pad, kb), rdt)
                bp = bp.at[:, ridx].set(rs[:, None] * b2[:, prc])
                y = core(pool, linv, uinv, t1, t2, bp)[:, ridx]
                return jnp.zeros((2, n, kb), rdt).at[:, pc].set(
                    cs[:, None] * y)

            def bound(pool, linv, uinv, b2):
                return dev_solve(pool, linv, uinv, b2, ridx, prc, pc,
                                 rs, cs, tl, tu)
        else:   # ring embedding: f32 pool, interleaved (re, im) rows
            fdt = jnp.dtype(np.float32)
            rs = jnp.asarray(self.row_scale[self.rowperm[self.colperm]],
                             dtype=fdt)
            cs = jnp.asarray(self.col_scale[self.colperm], dtype=fdt)
            ri_re = jnp.asarray(self._rows_idx[0::2])
            ri_im = jnp.asarray(self._rows_idx[1::2])
            if (self._use_pallas() and self._pallas_solve_ok()
                and self._pallas_solve_rows_ok()):
                import os
                from ..ops.kernels import pallas_exec as _pe
                interp = (os.environ.get("SLU_TPU_FORCE_PALLAS", "")
                          == "interpret")
                sfn, (tl, tu), W = _pe.build_solve_fn_pallas_fused(
                    plan, kb, chunk=min(self.options.gemm_chunk, 16),
                    interpret=interp)

                def solve_inner(pool, linv, uinv, bp, t1, t2):
                    bw = jnp.zeros((rows_pad, W), fdt).at[:, :kb].set(bp)
                    return sfn(pool, linv, uinv, t1, t2, bw)[:, :kb]
            else:
                core = _blocklu.build_solve_core(
                    plan, kb, chunk=self.options.gemm_chunk)
                tl, tu = self.ltape, self.utape

                def solve_inner(pool, linv, uinv, bp, t1, t2):
                    return core(pool, linv, uinv, t1, t2, bp)

            @jax.jit
            def dev_solve(pool, linv, uinv, b2, ri_re, ri_im, prc, pc,
                          rs, cs, t1, t2):
                bp = jnp.zeros((rows_pad, kb), fdt)
                bp = bp.at[ri_re].set(rs[:, None] * b2[0][prc])
                bp = bp.at[ri_im].set(rs[:, None] * b2[1][prc])
                y = solve_inner(pool, linv, uinv, bp, t1, t2)
                yr, yi = y[ri_re], y[ri_im]
                z = jnp.zeros((n, kb), fdt)
                return jnp.stack([z.at[pc].set(cs[:, None] * yr),
                                  z.at[pc].set(cs[:, None] * yi)])

            def bound(pool, linv, uinv, b2):
                return dev_solve(pool, linv, uinv, b2, ri_re, ri_im,
                                 prc, pc, rs, cs, tl, tu)

        self._solve_fns[key] = bound
        return bound

    def _solve_device_cplx(self, b: np.ndarray, squeeze: bool):
        """Complex device-resident solve entry (numpy in/out): ships one
        stacked (2, n, kb) real array per bucket, returns complex."""
        n = self.n
        rdt = (np.float32 if getattr(self, "_embed", False)
               else _real_base(self.dtype))
        k = b.shape[1]
        cap = self._RHS_BUCKETS[-1]
        with self.stat.phase("SOLVE"):
            outs = []
            for lo in range(0, k, cap):
                piece = b[:, lo:lo + cap]
                kp = piece.shape[1]
                kb = next(c for c in self._RHS_BUCKETS if c >= kp)
                b2 = np.zeros((2, n, kb), dtype=rdt)
                b2[0, :, :kp] = piece.real
                b2[1, :, :kp] = piece.imag
                x2 = np.asarray(self._device_solve_fn_cplx(kb)(
                    self.pool, self.linv, self.uinv, jnp.asarray(b2)))
                x = x2[0] + 1j * x2[1]
                outs.append(x[:, :kp] if kp < kb else x)
            x = outs[0] if len(outs) == 1 else np.concatenate(outs, axis=1)
        x = x.astype(self.dtype)
        return x[:, 0] if squeeze else x

    _RHS_BUCKETS = (1, 8, 32, 128)

    def _solve_device(self, b, squeeze: bool, want_device: bool):
        """Device-resident solve entry: numpy inputs are padded to the
        nrhs bucket ON THE HOST (so the transfer is the payload plus pad,
        and the jitted solve needs no eager reshape dispatches — each
        eager op costs a tunnel round-trip on remote TPUs); jax inputs
        stay on device and pad eagerly. nrhs > 128 runs in 128-wide
        chunks; on the fused Pallas path every bucket reuses the same
        W=128-lane kernel, only the thin XLA wrapper recompiles."""
        import jax

        n = self.n
        fdt = jnp.dtype(self._fdtype)
        is_np = not isinstance(b, jax.Array)
        k = b.shape[1]
        cap = self._RHS_BUCKETS[-1]
        with self.stat.phase("SOLVE"):
            outs = []
            for lo in range(0, k, cap):
                piece = b[:, lo:lo + cap]
                kp = piece.shape[1]
                kb = next(c for c in self._RHS_BUCKETS if c >= kp)
                if is_np:
                    bp = np.zeros((n, kb), dtype=fdt)
                    bp[:, :kp] = piece
                    piece = jnp.asarray(bp)
                else:
                    piece = piece.astype(fdt)
                    if kp < kb:
                        piece = jnp.zeros((n, kb), fdt) \
                            .at[:, :kp].set(piece)
                x = self._device_solve_fn(kb)(self.pool, self.linv,
                                              self.uinv, piece)
                outs.append(x[:, :kp] if kp < kb else x)
            x = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
            if not want_device:
                x = np.asarray(x)
        return x[:, 0] if squeeze else x

    def solve(self, b, trans: Trans = Trans.NOTRANS) -> np.ndarray:
        """Single LU solve (no refinement) — ``pdgstrs`` analog.

        Under the default ``gemm_precision="auto"`` the fused TPU
        kernels factor with single-pass bf16 Schur GEMMs, so a RAW
        solve is bf16-quality (~1e-3 relative) until :meth:`refine`
        restores double-quality berr (the psgssvx_d2 design). Callers
        that need full-precision raw solves without refinement should
        set ``gemm_precision="highest"`` or ``iter_refine=NOREFINE``
        (either disables the low-pass factor)."""
        self._require_factors()
        # accept the reference's integer trans_t codes (0/1/2) and the
        # letter codes too — an unrecognized value must NOT silently run
        # the NOTRANS path
        if not isinstance(trans, Trans):
            if isinstance(trans, str):
                try:
                    trans = Trans(trans)
                except ValueError:
                    trans = None
            elif (isinstance(trans, (int, np.integer))
                  and not isinstance(trans, bool) and 0 <= trans <= 2):
                trans = list(Trans)[int(trans)]
            else:
                trans = None
            if trans is None:
                raise ValueError("invalid trans value; expected "
                                 "Trans.NOTRANS/TRANS/CONJ, 'N'/'T'/'C', "
                                 "or 0/1/2")
        if trans == Trans.TRANS:
            return self.solve_transposed(b)
        if trans == Trans.CONJ:
            return self.solve_transposed(b, conj=True)
        if self._device_solve_ok:
            try:
                if not self._use_planar() and not getattr(self, "_embed",
                                                          False):
                    import jax
                    want_device = isinstance(b, jax.Array)
                    squeeze = b.ndim == 1
                    bb = b[:, None] if squeeze else b
                    return self._solve_device(bb, squeeze, want_device)
                # complex (embed/planar): device-resident re/im planes
                bb = np.asarray(b)
                squeeze = bb.ndim == 1
                return self._solve_device_cplx(
                    bb[:, None] if squeeze else bb, squeeze)
            except Exception as e:
                # at capacity scale (n=885k: pool 13.4 of 15.75 GiB) the
                # fused transform+sweep program can exceed HBM by a few
                # tens of MB — degrade once to the host-transform path
                # (smaller device footprint) instead of failing
                if "memory" not in str(e).lower():
                    raise
                self._device_solve_ok = False
                self.stat.counters["solve_hbm_fallback"] = 1
        b = np.asarray(b)
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        plan = self.plan
        nrhs = b.shape[1]
        # b3 = Pc Pr Dr b  (rows of A3 correspond to original rows prc[k])
        prc = self.rowperm[self.colperm]
        bp = np.zeros((self._bpad_rows(), nrhs), dtype=self._fdtype)
        b3 = self.row_scale[prc, None] * b[prc]
        bp[self._rows_idx] = _embed_rhs(b3) \
            if getattr(self, "_embed", False) else b3
        with self.stat.phase("SOLVE"):
            y = self._solve_factored(bp)
        y = _unembed_sol(y[self._rows_idx]) \
            if getattr(self, "_embed", False) else y[self._rows_idx]
        # x = Dc Pcᵀ y
        x = np.empty((self.n, nrhs), dtype=y.dtype)
        x[self.colperm] = self.col_scale[self.colperm, None] * y
        return x[:, 0] if squeeze else x

    def _berr(self, x, b, trans: Trans = Trans.NOTRANS):
        """Componentwise backward error with safe1/safe2 guards
        (reference: pdgsrfs.c:189-231). x, b: (n, k). Also returns r.
        ``trans`` selects the operator (A, Aᵀ, or Aᴴ) of the solve being
        checked — the residual/denominator follow options->Trans as in
        the reference's transpose branches."""
        rows, cols, vals = self._coo_ref
        if self._use_planar() or getattr(self, "_embed", False):
            rdt = _real_base(self.refine_dtype)
            x = np.asarray(x, dtype=self.refine_dtype)
            b = np.asarray(b, dtype=self.refine_dtype)
            x2 = jnp.asarray(np.stack([x.real, x.imag]).astype(rdt))
            vr, vi = vals
            if trans == Trans.NOTRANS:
                ax2 = _spmv.spmv_planar(rows, cols, vr, vi, x2, self.n)
                dn = _spmv.abs_spmv_planar(
                    rows, cols, self._coo_abs,
                    jnp.sqrt(x2[0] ** 2 + x2[1] ** 2), self.n)
            else:
                vj = -vi if trans == Trans.CONJ else vi
                ax2 = _spmv.spmv_t_planar(rows, cols, vr, vj, x2, self.n)
                dn = _spmv.abs_spmv_t_planar(
                    rows, cols, self._coo_abs,
                    jnp.sqrt(x2[0] ** 2 + x2[1] ** 2), self.n)
            ax = np.asarray(ax2)
            r = b - (ax[0] + 1j * ax[1])
            denom = np.asarray(dn) + np.abs(b)
        elif trans == Trans.NOTRANS:
            xj = jnp.asarray(x, dtype=self.refine_dtype)
            bj = jnp.asarray(b, dtype=self.refine_dtype)
            r = np.asarray(bj - _spmv.spmv(rows, cols, vals, xj, self.n))
            denom = np.asarray(
                _spmv.abs_spmv(rows, cols, vals, jnp.abs(xj), self.n)
                + jnp.abs(bj))
        else:
            xj = jnp.asarray(x, dtype=self.refine_dtype)
            bj = jnp.asarray(b, dtype=self.refine_dtype)
            v = jnp.conj(vals) if trans == Trans.CONJ else vals
            r = np.asarray(bj - _spmv.spmv_t(rows, cols, v, xj, self.n))
            denom = np.asarray(
                _spmv.abs_spmv_t(rows, cols, vals, jnp.abs(xj), self.n)
                + jnp.abs(bj))
        nz = self._max_row_nnz() + 1
        safe1 = nz * np.finfo(np.float64).tiny
        safe2 = safe1 / np.finfo(np.float64).eps
        num = np.abs(r)
        val = np.where(denom > safe2, num / np.maximum(denom, safe1),
                       (num + safe1) / (denom + safe1))
        return val.max(axis=0), r

    def _export_factors(self):
        """(pool, linv, uinv) as host arrays in the canonical single-chip
        layout (global slot / step indexed). The mesh drivers override
        to gather their sharded state — checkpoints stay portable."""
        return (np.asarray(self.pool), np.asarray(self.linv),
                np.asarray(self.uinv))

    def _max_row_nnz(self) -> int:
        """Global max row-nnz (for the berr safe1/safe2 guards). Sharded-
        input processes use the broadcast value — it MUST be identical on
        every process (it is baked into the SPMD refine program)."""
        if getattr(self, "_nz_global", None) is not None:
            return self._nz_global
        return int(self._A_orig.getnnz(axis=1).max())

    #: subclasses without a single-device solve path disable device fusion
    _fused_refine_ok = True

    def _fused_refine_fn(self, nrhs: int):
        """One-dispatch iterative refinement: the whole
        residual → transform → solve → update loop runs on device inside a
        single jitted while_loop (the host-loop refine() round-trips the
        tunnel per iteration, ~30ms each on the remote TPU)."""
        key = ("FR", nrhs)
        if key in self._solve_fns:
            return self._solve_fns[key]
        import jax
        from jax import lax

        plan = self.plan
        n = self.n
        rdt = jnp.dtype(self.refine_dtype)
        fdt = jnp.dtype(self.dtype)
        rows, cols, _ = self._coo_ref   # pattern is fixed per plan
        rows_pad = self._bpad_rows()
        eps = _real_eps(self.refine_dtype)
        nz = self._max_row_nnz() + 1
        safe1 = nz * np.finfo(np.float64).tiny
        safe2 = safe1 / np.finfo(np.float64).eps
        itmax = self.options.max_refine_steps
        rthresh = self.options.refine_rthresh

        # plan-specific arrays (COO pattern, row placement, solve tapes)
        # ride as OPERANDS so same-bucket plans share one compiled refine
        # (see _device_solve_fn)
        if (self._use_pallas() and self._pallas_solve_ok()
                and self._pallas_solve_rows_ok()):
            import os
            from ..ops.kernels import pallas_exec as _pe
            interp = (os.environ.get("SLU_TPU_FORCE_PALLAS", "")
                      == "interpret")
            sfn, (tl, tu), W = _pe.build_solve_fn_pallas_fused(
                plan, nrhs, chunk=min(self.options.gemm_chunk, 16),
                interpret=interp)

            def solve_inner(pool, linv, uinv, bp, t1, t2):
                bw = jnp.zeros((rows_pad, W), fdt).at[:, :nrhs].set(bp)
                return sfn(pool, linv, uinv, t1, t2, bw)[:, :nrhs]
        else:
            core = _blocklu.build_solve_core(
                plan, nrhs, chunk=self.options.gemm_chunk)
            tl, tu = self.ltape, self.utape

            def solve_inner(pool, linv, uinv, bp, t1, t2):
                return core(pool, linv, uinv, t1, t2, bp)

        ridx_a = jnp.asarray(self._rows_idx)  # expansion-aware placement

        def lu_solve(pool, linv, uinv, prc, pc, rs, cs, r, ridx, t1, t2):
            """Dr/Pr/Pc transforms + LU solve + back-transform (device)."""
            bp = jnp.zeros((rows_pad, nrhs), fdt)
            bp = bp.at[ridx].set((rs[:, None] * r[prc]).astype(fdt))
            y = solve_inner(pool, linv, uinv, bp, t1, t2)[ridx]
            return jnp.zeros((n, nrhs), rdt).at[pc].set(
                cs[:, None] * y.astype(rdt))

        @jax.jit
        def refine_j(pool, linv, uinv, vals, prc, pc, rs, cs, b, x0,
                     rows, cols, ridx, t1, t2):
            b = b.astype(rdt)

            def berr_of(x):
                r = b - _spmv.spmv(rows, cols, vals, x, n)
                denom = _spmv.abs_spmv(rows, cols, vals, jnp.abs(x), n) \
                    + jnp.abs(b)
                num = jnp.abs(r)
                val = jnp.where(denom > safe2,
                                num / jnp.maximum(denom, safe1),
                                (num + safe1) / (denom + safe1))
                return val.max(axis=0), r

            def cond(carry):
                x, berr, prev, it = carry
                keep = (berr > eps).any() & (berr <= rthresh * prev).all()
                return (it < itmax) & ((it == 0) | keep)

            def body(carry):
                x, berr, prev, it = carry
                r = b - _spmv.spmv(rows, cols, vals, x, n)
                x = x + lu_solve(pool, linv, uinv, prc, pc, rs, cs, r,
                                 ridx, t1, t2)
                nberr, _ = berr_of(x)
                return (x, nberr.astype(berr.dtype), berr, it + 1)

            berr0, _ = berr_of(x0.astype(rdt))
            rreal = jnp.dtype(_real_base(rdt))
            x, berr, prev, it = lax.while_loop(
                cond, body,
                (x0.astype(rdt), berr0.astype(rreal),
                 jnp.full((nrhs,), jnp.inf, rreal),
                 jnp.zeros((), jnp.int32)))
            return x, berr, it

        def refine(pool, linv, uinv, vals, prc, pc, rs, cs, b, x0):
            return refine_j(pool, linv, uinv, vals, prc, pc, rs, cs, b,
                            x0, rows, cols, ridx_a, tl, tu)

        self._solve_fns[key] = refine
        return refine

    def _fused_cplx_ok(self) -> bool:
        """Can complex refinement run as one fused device dispatch?
        (mesh drivers override: their embed variant is in-mesh)"""
        return self._fused_refine_ok and self._device_solve_ok

    def _fused_refine_fn_cplx(self, nrhs: int):
        """One-dispatch complex refinement over (re, im) planes: planar
        residual SpMV + modulus berr + the device-resident complex solve,
        the whole loop a jitted while_loop (the pzgsrfs analog; before
        this, complex refines paid a host round-trip per iteration)."""
        key = ("FRC", nrhs)
        if key in self._solve_fns:
            return self._solve_fns[key]
        import jax
        from jax import lax

        n = self.n
        rb = jnp.dtype(_real_base(self.refine_dtype))
        eps = _real_eps(self.refine_dtype)
        nz = self._max_row_nnz() + 1
        safe1 = nz * np.finfo(np.float64).tiny
        safe2 = safe1 / np.finfo(np.float64).eps
        itmax = self.options.max_refine_steps
        rthresh = self.options.refine_rthresh
        # transforms (Dr/Pr/Pc and back) live inside the inner solve;
        # it consumes planes in the FACTOR precision (f32 for the
        # embedding) — cast explicitly (mixed-precision residual)
        inner = self._device_solve_fn_cplx(nrhs)
        sdt = (jnp.dtype(np.float32) if getattr(self, "_embed", False)
               else jnp.dtype(_real_base(self.dtype)))

        @jax.jit
        def refine(pool, linv, uinv, b2, x02, rows, cols, vr, vi, vabs):
            b2 = b2.astype(rb)

            def berr_of(x2):
                ax = _spmv.spmv_planar(rows, cols, vr, vi, x2, n)
                r2 = b2 - ax
                xm = jnp.sqrt(x2[0] * x2[0] + x2[1] * x2[1])
                denom = _spmv.abs_spmv(rows, cols, vabs, xm, n) \
                    + jnp.sqrt(b2[0] * b2[0] + b2[1] * b2[1])
                num = jnp.sqrt(r2[0] * r2[0] + r2[1] * r2[1])
                val = jnp.where(denom > safe2,
                                num / jnp.maximum(denom, safe1),
                                (num + safe1) / (denom + safe1))
                return val.max(axis=0), r2

            def cond(carry):
                x2, berr, prev, it = carry
                keep = (berr > eps).any() & (berr <= rthresh * prev).all()
                return (it < itmax) & ((it == 0) | keep)

            def body(carry):
                x2, berr, prev, it = carry
                _, r2 = berr_of(x2)
                dx2 = inner(pool, linv, uinv, r2.astype(sdt))
                x2 = x2 + dx2.astype(rb)
                nberr, _ = berr_of(x2)
                return (x2, nberr, berr, it + 1)

            berr0, _ = berr_of(x02.astype(rb))
            x2, berr, prev, it = lax.while_loop(
                cond, body,
                (x02.astype(rb), berr0,
                 jnp.full((nrhs,), jnp.inf, rb),
                 jnp.zeros((), jnp.int32)))
            return x2, berr, it

        def bound(pool, linv, uinv, b2, x02):
            # COO values read at CALL time: a SamePattern* refactor
            # rebuilds _coo_ref/_coo_abs and the refine must follow the
            # new values (same contract as the real fused refine's
            # call-time vals operand)
            rows, cols, (vr, vi) = self._coo_ref
            return refine(pool, linv, uinv, b2, x02, rows, cols, vr, vi,
                          self._coo_abs)

        self._solve_fns[key] = bound
        return bound

    #: distributed drivers keep their own factor machinery — precision
    #: escalation re-runs _device_factor, which only the single-chip
    #: driver supports from stored values
    _escalate_ok = True

    def _should_escalate(self, berr) -> bool:
        """True when the "auto" low-pass factor stalled refinement above
        the accuracy a "highest" factor would reach (psgssvx_d2's
        escalate-one-precision policy, psgssvx_d2.c:516-1584)."""
        if not self._escalate_ok:
            return False
        if (self.options.gemm_precision or "auto") != "auto":
            return False
        if getattr(self, "_gemm_prec_used", "highest") != "default":
            return False
        eps = _real_eps(self.refine_dtype)
        return bool(np.max(berr) > 1000.0 * eps)

    def _refactor_values(self, precision: str) -> None:
        """Re-run the numeric factorization on the stored A3 values with
        a forced Schur-GEMM precision (same plan, same perms)."""
        import types
        self._prec_override = precision
        try:
            self._device_factor(types.SimpleNamespace(
                data=self._a3_data))
        finally:
            del self._prec_override

    def refine(self, b, x0: np.ndarray, trans: Trans = Trans.NOTRANS):
        """Iterative refinement with automatic precision escalation: if
        the bf16-pass ("high") factor leaves refinement stalled above
        ~1000·eps, re-factor at "highest" and refine again (the
        psgssvx_d2 escalation; gemm_precision="auto")."""
        x, berr = self._refine_impl(b, x0, trans)
        if self._should_escalate(berr):
            self.stat.counters["precision_escalated"] = 1
            self._prec_sticky = "highest"   # refactors skip the bf16 try
            self._refactor_values("highest")
            x, berr = self._refine_impl(b, np.asarray(x), trans)
        return x, berr

    def _refine_impl(self, b, x0: np.ndarray, trans: Trans = Trans.NOTRANS):
        """Iterative refinement — ``pdgsrfs`` analog (pdgsrfs.c:129-251).

        Residuals in ``refine_dtype`` (mixed precision: psgssvx_d2 pattern).
        Stops at ITMAX steps, at componentwise backward error ≤ eps, or when
        the error stops halving (pdgsrfs.c:237). On a single device the
        whole loop is fused into one jitted dispatch. Transpose modes run
        the host loop with Aᵀ/Aᴴ residuals.
        """
        if trans != Trans.NOTRANS:
            return self._refine_hostloop(b, x0, trans=trans)
        if self._use_planar() or getattr(self, "_embed", False):
            # complex (planar or embedded): fused one-dispatch loop over
            # (re, im) planes (single-chip and the mesh embed variant;
            # native-complex mesh pools use the real fused path below)
            if self._fused_cplx_ok():
                bb = np.asarray(b)
                squeeze = bb.ndim == 1
                if squeeze:
                    bb = bb[:, None]
                x = np.asarray(x0)
                if x.ndim == 1:
                    x = x[:, None]
                fn = self._fused_refine_fn_cplx(bb.shape[1])
                rb = jnp.dtype(_real_base(self.refine_dtype))
                b2 = jnp.asarray(np.stack([bb.real, bb.imag]).astype(rb))
                x2 = jnp.asarray(np.stack([x.real, x.imag]).astype(rb))
                with self.stat.phase("REFINE"):
                    xo2, berr, it = fn(self.pool, self.linv, self.uinv,
                                       b2, x2)
                    xo2 = np.asarray(xo2)
                    berr = np.asarray(berr)
                self.stat.refine_steps = int(it)
                xo = (xo2[0] + 1j * xo2[1]).astype(self.refine_dtype)
                return (xo[:, 0] if squeeze else xo), np.atleast_1d(berr)
            return self._refine_hostloop(b, x0)
        if self._fused_refine_ok:
            bb = np.asarray(b)
            squeeze = bb.ndim == 1
            if squeeze:
                bb = bb[:, None]
            x = np.asarray(x0)
            if x.ndim == 1:
                x = x[:, None]
            fn = self._fused_refine_fn(bb.shape[1])
            rdt = self.refine_dtype
            with self.stat.phase("REFINE"):
                xo, berr, it = fn(
                    self.pool, self.linv, self.uinv, self._coo_ref[2],
                    jnp.asarray(self.rowperm[self.colperm]),
                    jnp.asarray(self.colperm),
                    jnp.asarray(self.row_scale[self.rowperm[self.colperm]],
                                dtype=rdt),
                    jnp.asarray(self.col_scale[self.colperm], dtype=rdt),
                    jnp.asarray(bb), jnp.asarray(x))
                xo = np.asarray(xo)
                berr = np.asarray(berr)
            self.stat.refine_steps = int(it)
            return (xo[:, 0] if squeeze else xo), np.atleast_1d(berr)
        return self._refine_hostloop(b, x0)

    def _refine_hostloop(self, b, x0: np.ndarray,
                         trans: Trans = Trans.NOTRANS):
        """Host-driven refinement loop (distributed drivers, trans modes)."""
        opts, stat = self.options, self.stat
        b = np.asarray(b)
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        x = np.asarray(x0, dtype=self.refine_dtype)
        if x.ndim == 1:
            x = x[:, None]
        eps = _real_eps(self.refine_dtype)
        berr_prev = np.full(b.shape[1], np.inf)
        berr = berr_prev
        with stat.phase("REFINE"):
            for it in range(opts.max_refine_steps):
                berr, r = self._berr(x, b, trans=trans)
                if np.all(berr <= eps):
                    break
                if np.all(berr > opts.refine_rthresh * berr_prev):
                    break  # not halving — diminishing returns
                berr_prev = berr
                dx = self.solve(r, trans=trans)
                x = x + dx.reshape(x.shape).astype(self.refine_dtype)
                stat.refine_steps = it + 1
            else:
                berr, _ = self._berr(x, b, trans=trans)
        return (x[:, 0] if squeeze else x), np.atleast_1d(berr)

    # ------------------------------------------------------------------
    # condition estimation (pdlangs + pdgscon-style analog)
    # ------------------------------------------------------------------

    def profile_levels(self):
        """Per-elimination-level device timings of the factorization tape
        — the fine-grain profiler role of the reference's SCT_t counters
        (reference: SRC/include/superlu_defs.h SCT_t; per-phase timing in
        dSchCompUdt-2Ddynamic.c). Re-runs the stored schedule one level
        per dispatch and returns a list of per-level dicts (ms, steps,
        lpanels, upanels, gemms, gflops_model). Each row's wall time
        includes one dispatch + sync, so read the shape, not the sum.

        The profile always runs the level-batched XLA hybrid executor —
        per-level timing is only meaningful there; fused single-kernel
        executors (clk/tck/flk) have no level boundary to time (their
        counters live in stat.counters['clk_*'/'tck_*'/'flk_*']). The
        current factors are RELEASED first (peak device memory stays ~one
        pool, the capacity-scale discipline of _device_factor) and the
        profiled factorization is reinstalled as the live factors — same
        math, same pool/linv/uinv shapes — so the instance stays
        solve-ready.
        """
        if self._use_planar():
            raise NotImplementedError(
                "profile_levels: planar complex executor not supported")
        if getattr(self, "_a3_data", None) is None:
            raise RuntimeError(
                "profile_levels needs the single-chip factorization input "
                "values, which this instance does not carry (load_factors-"
                "restored, or a mesh-distributed driver) — use a freshly "
                "factored single-chip SparseLU")
        from ..ops.kernels import blocklu as _bl
        # release-first: holding the old pool while the profiler builds a
        # fresh one doubles peak memory — exactly what OOMs at capacity
        self.pool = self.linv = self.uinv = None
        rows, (pool, linv, uinv, tiny) = _bl.profile_factor_levels(
            self.plan, self._a3_data, self._fdtype, self._thresh(),
            chunk=self.options.gemm_chunk)
        self.pool, self.linv, self.uinv = pool, linv, uinv
        self.stat.counters["profiled_levels"] = len(rows)
        self.stat.counters["profiled_executor_is_hybrid"] = 1
        return rows

    def rcond_1(self) -> float:
        """Reciprocal 1-norm condition estimate via Hager/Higham iteration
        (the LAPACK dlacn2 algorithm the reference's gscon path wraps),
        powered by the factorization's solve + transpose solve.

        Follows the dlacn2 contract: at most ITMAX=5 power steps
        (dlacn2's own cap), stopping early when the estimate stops
        increasing or the dual test |z|_∞ ≤ zᵀx signals a stationary
        point, then the alternating-sign probe guards against
        underestimation. ``stat.counters['rcond_iters']`` records the
        steps taken and ``'rcond_converged'`` whether a stopping test
        fired before the cap (0 means the cap was hit — the estimate is
        still a valid lower bound, as in dlacn2)."""
        n = self.n
        anorm = (self._anorm1_global
                 if getattr(self, "_anorm1_global", None) is not None
                 else langs("1", self._A_orig))
        if anorm == 0:
            return 0.0
        x = np.full(n, 1.0 / n)
        est = 0.0
        converged = 0
        it = 0
        for it in range(1, 6):
            y = self.solve(x)
            est_new = float(np.abs(y).sum())
            if it > 1 and est_new <= est:
                converged = 1          # estimate stopped increasing
                break
            est = max(est, est_new)
            xi = np.sign(y)
            xi[xi == 0] = 1.0
            z = self.solve_transposed(xi)
            j = int(np.argmax(np.abs(z)))
            if np.abs(z[j]) <= float(np.real(np.vdot(z, x))):
                converged = 1          # stationary point of the dual
                break
            x = np.zeros(n)
            x[j] = 1.0
        # alternating-sign probe (guards against underestimation)
        v = np.array([(-1.0) ** i * (1.0 + i / max(n - 1, 1))
                      for i in range(n)])
        est = max(est, 2.0 * np.abs(self.solve(v)).sum() / (3.0 * n))
        self.stat.counters["rcond_iters"] = it
        self.stat.counters["rcond_converged"] = converged
        return float(1.0 / (anorm * est)) if est > 0 else 0.0

    # ------------------------------------------------------------------
    # extras: diag(U), logdet (pdGetDiagU / PYTHON pdbridge_logdet analogs)
    # ------------------------------------------------------------------

    def _diag_sel(self):
        """Selector mapping padded diagonal entries back to the original
        columns (identity without alignment, the expansion map with it)."""
        exp = getattr(self, "_expand", None)
        return slice(0, self.n) if exp is None else exp

    def diag_u(self) -> np.ndarray:
        """Diagonal of U in elimination order (reference: pdGetDiagU.c)."""
        pool = np.asarray(self.pool)
        if pool.ndim == 4:   # planar complex layout (slots, 2, bs, bs)
            pool = pool[:, 0] + 1j * pool[:, 1]
        bs, nb = self.plan.bs, self.plan.nb
        if getattr(self, "_embed", False):
            # U = embed(U_c): Re(U_kk) on the diagonal (rows 2k, 2k+1),
            # Im(U_kk) at (2k+1, 2k) of the same block
            blocks = pool[np.asarray(self.plan.diag_slot)]
            re = blocks[:, np.arange(bs), np.arange(bs)].reshape(nb * bs)
            im = blocks[:, np.arange(1, bs, 2),
                        np.arange(0, bs, 2)].reshape(nb * (bs // 2))
            return (re[0::2] + 1j * im)[self._diag_sel()]
        d = pool[np.asarray(self.plan.diag_slot)][:, np.arange(bs),
                                                  np.arange(bs)]
        return d.reshape(nb * bs)[self._diag_sel()]

    def logdet(self):
        """(sign_or_phase, log|det A|) — PYTHON/pdbridge.py logdet analog."""
        du = self.diag_u().astype(np.complex128)
        logabs = float(np.sum(np.log(np.abs(du)))
                       - np.sum(np.log(self.row_scale))
                       - np.sum(np.log(self.col_scale)))
        phase = np.prod(du / np.abs(du))
        # symmetric Pc application cancels its sign; count Pr parity
        phase *= _perm_sign(self.rowperm)
        if np.dtype(self.dtype).kind != "c":
            phase = float(np.real(phase))
        return phase, logabs


def gssvx(A, b, options: Optional[Options] = None,
          lu: Optional[SparseLU] = None):
    """One-call expert driver (``pdgssvx`` analog). Returns (result, lu).

    Pass ``lu`` with ``options.fact`` set to a reuse mode to stage
    refactorization / solve-only paths (the pddrive1/2/3 example patterns).
    """
    options = options or Options()
    stat = Stats()
    if options.fact == Fact.FACTORED:
        if lu is None:
            raise ValueError("FACTORED requires an existing SparseLU")
        lu.stat = stat
    elif lu is not None and options.fact in (
            Fact.SAME_PATTERN, Fact.SAME_PATTERN_SAME_ROWPERM):
        lu.stat = stat
        lu.options = options
        lu.refactor(A, fact=options.fact)
    else:
        lu = SparseLU(A, options=options, stat=stat)

    # honor options.trans (pdgssvx honors options->Trans, pdgssvx.c:622):
    # the solve, the refinement residuals, and berr all use A / Aᵀ / Aᴴ.
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
                       info=getattr(lu, "info", 0), rcond=rcond), lu


# ---------------------------------------------------------------------------
# factor persistence (SolveOnly / checkpoint-resume analog)
# ---------------------------------------------------------------------------
#
# The reference has no on-disk checkpointing (staged reuse only) plus a
# debug-only WRITELU/LUFILE dump; here factors + symbolic plan + perms are
# plain arrays, so persistence is natural (SURVEY §5 "checkpoint/resume":
# persist symbolic outputs + factors). ``SolveOnly`` (superlu_defs.h:696,
# treat input as prefactored) maps to loading a saved factorization.


def save_factors(lu: SparseLU, path) -> None:
    """Persist a factorization: block pool, diagonal inverses, symbolic
    plan, permutations, scalings, and the original A (for refinement).
    Mesh-distributed drivers export their sharded state in the canonical
    single-chip layout (``_export_factors``), so a checkpoint written on
    any grid loads as a portable SolveOnly object."""
    import dataclasses as _dc
    plan_fields = {}
    for f in _dc.fields(lu.plan):
        v = getattr(lu.plan, f.name)
        plan_fields["plan_" + f.name] = np.asarray(v)
    if getattr(lu, "_nrloc", None) is not None and \
            getattr(lu.options, "dist_planning", False):
        raise NotImplementedError(
            "save_factors from a dist_planning session is not supported: "
            "NO process holds the global A this checkpoint embeds for "
            "refinement (that is the point of dist_planning) — gather "
            "mode or a single-process session can checkpoint")
    pool, linv, uinv = lu._export_factors()   # collective on meshes
    from ..parallel import multihost as _mh
    if _mh.process_count() > 1 and _mh.process_index() != 0:
        # every process participated in the in-mesh gather; only process
        # 0 owns the global A (sharded-NRLoc sessions) and writes the file
        return
    A = sp.csc_matrix(lu._A_orig)
    np.savez_compressed(
        path,
        pool=pool, linv=linv, uinv=uinv,
        rowperm=lu.rowperm, colperm=lu.colperm,
        row_scale=lu.row_scale, col_scale=lu.col_scale,
        a_indptr=A.indptr, a_indices=A.indices, a_data=A.data,
        a_shape=np.asarray(A.shape),
        dtype=np.asarray(str(lu.options.dtype)),
        block_size=np.asarray(lu.options.block_size),
        anorm=np.asarray(lu._anorm),
        embed=np.asarray(bool(getattr(lu, "_embed", False))),
        expand=(np.asarray(lu._expand)
                if getattr(lu, "_expand", None) is not None
                else np.empty(0, dtype=np.int64)),
        **plan_fields)


def load_factors(path, options: Optional[Options] = None) -> SparseLU:
    """Reconstruct a solve-ready SparseLU from :func:`save_factors` output
    without refactoring (the SolveOnly path)."""
    import dataclasses as _dc
    from ..ops.host.symbolic import SymbolicPlan

    z = np.load(path, allow_pickle=False)
    options = options or Options()
    options = options.replace(dtype=str(z["dtype"]),
                              block_size=int(z["block_size"]))

    lu = SparseLU.__new__(SparseLU)
    lu.options = options
    lu.stat = Stats()
    lu.n = int(z["a_shape"][0])
    lu.dtype = np.dtype(_DTYPES[options.dtype])
    lu.refine_dtype = _resolve_refine_dtype(options)
    kw = {}
    for f in _dc.fields(SymbolicPlan):
        v = z["plan_" + f.name]
        kw[f.name] = v if v.ndim else v.item()
    lu.plan = SymbolicPlan(**kw)
    lu.rowperm = z["rowperm"]
    lu.colperm = z["colperm"]
    lu.row_scale = z["row_scale"]
    lu.col_scale = z["col_scale"]
    lu._anorm = float(z["anorm"])
    lu._A_orig = sp.csc_matrix(
        (z["a_data"], z["a_indices"], z["a_indptr"]),
        shape=tuple(z["a_shape"]))
    lu.pool = jnp.asarray(z["pool"])
    lu.linv = jnp.asarray(z["linv"])
    lu.uinv = jnp.asarray(z["uinv"])
    lu._solve_fns = {}
    lu.ltape = _blocklu.make_solve_tapes(lu.plan, "L")
    lu.utape = _blocklu.make_solve_tapes(lu.plan, "U")
    lu._planar = z["pool"].ndim == 4   # planar layout self-describes
    lu._embed = bool(z["embed"]) if "embed" in z.files else False
    exp = z["expand"] if "expand" in z.files else np.empty(0, np.int64)
    lu._expand = exp if len(exp) else None
    lu._n_e = ((lu.plan.n // 2 if lu._embed else lu.plan.n)
               if lu._expand is not None else None)
    base = lu._expand if lu._expand is not None \
        else np.arange(lu.n, dtype=np.int64)
    if lu._embed:
        ri = np.empty(2 * len(base), dtype=np.int64)
        ri[0::2] = 2 * base
        ri[1::2] = 2 * base + 1
        lu._rows_idx = ri
    else:
        lu._rows_idx = base
    if lu._planar or lu._embed:
        rdt = _real_base(lu.refine_dtype)
        lu._coo_ref = _spmv.coo_arrays_planar(lu._A_orig, jnp.dtype(rdt))
        vr, vi = lu._coo_ref[2]
        lu._coo_abs = jnp.sqrt(vr * vr + vi * vi)
    else:
        lu._coo_ref = _spmv.coo_arrays(lu._A_orig,
                                       jnp.dtype(lu.refine_dtype))
    lu.info = 0
    return lu
