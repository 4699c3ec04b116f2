"""Device block-sparse LU: tape-driven factorization + level-set solves.

TPU-native replacement for the reference's numeric core:

- the elimination loop of ``pdgstrf`` (reference: SRC/double/pdgstrf.c:243-2003)
  becomes a single compiled ``lax.fori_loop`` over *elimination levels*:
  independent block columns at one level factor as a batch (the static
  analog of look-ahead pipelining, pdgstrf.c:1110-1300);
- panel factorization + TRSMs (pdgstrf2.c:142-360, pdgstrs2_omp) become a
  vmapped recursive block LU (no pivoting, ReplaceTinyPivot semantics) with
  triangular inverses, so panel solves are batched GEMMs — the DiagInv idea
  of pdCompute_Diag_Inv (pdgstrs.c:842) applied everywhere;
- the Schur-complement GEMM + OpenMP scatter (dSchCompUdt-2Ddynamic.c:488-705,
  dscatter.c) becomes gather → batched B×B GEMM → indexed scatter-add on a
  flat block pool, with all indices precomputed by the symbolic phase;
- the message-driven triangular solves (pdgstrs.c:1039-3200,
  pdgstrs_lsum.c dlsum_fmod/bmod) become static level-set sweeps.

Shape polymorphism: every dimension that varies per matrix (pool slots,
tape lengths, level counts, block-column count) is padded to a bucket, and
executors are cached on the bucket signature — one compilation serves every
matrix in the same bucket class (crucial on TPU where a fresh XLA compile
costs minutes; the reference has no compile step to amortize).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..host.symbolic import SymbolicPlan

# TPU f32 matmuls default to fast bfloat16 passes; a direct solver needs the
# full-precision path (3/6-pass f32 emulation on the MXU) or the factor is
# only bf16-accurate. Overridable for experiments via SLU_TPU_MATMUL_PRECISION.
import os as _os

MATMUL_PRECISION = _os.environ.get("SLU_TPU_MATMUL_PRECISION", "highest")


# ---------------------------------------------------------------------------
# bucketing
# ---------------------------------------------------------------------------


def bucket125(x: int, lo: int = 8) -> int:
    """Smallest value ≥ x of the form 2^k · {1, 1.25, 1.5, 1.75} (≤25%
    padding waste). Used for pool/tape dimensions so compiled executors are
    shared across matrices."""
    x = max(int(x), lo)
    k = max(0, int(np.floor(np.log2(x))))
    for base in (1.0, 1.25, 1.5, 1.75, 2.0):
        cand = int(np.ceil((2 ** k) * base))
        if cand >= x:
            return cand
    return 2 ** (k + 1)


# Above this many pool slots, bucket the pool dimension at 1/32-of-octave
# granularity (≤3.1% waste) instead of 1/4 (≤25%). A 25% pad on a
# SuiteSparse-class pool is GiBs of HBM (n=1e6 at B=128: nslots 242689
# → 262144 would waste 1.2 GiB), while executor-compile sharing is
# irrelevant there — no two million-row matrices share a bucket anyway.
_FINE_SLOTS = 1 << 16


def bucket_fine(x: int, lo: int = 8) -> int:
    """bucket125 below _FINE_SLOTS; 1/32-octave steps above it."""
    x = max(int(x), lo)
    if x <= _FINE_SLOTS:
        return bucket125(x, lo)
    k = int(np.floor(np.log2(x)))
    step = 2 ** k / 32.0
    return int(np.ceil(np.ceil(x / step) * step))


def _pad_to(a, size, fill, dtype=np.int32):
    a = np.asarray(a, dtype=dtype)
    out = np.full(size, fill, dtype=dtype)
    out[: len(a)] = a
    return jnp.asarray(out)


def _pad_ptr(ptr, nlvl_pad):
    """Pad a level-pointer array by repeating its last value (empty levels)."""
    ptr = np.asarray(ptr, dtype=np.int32)
    out = np.full(nlvl_pad + 1, ptr[-1], dtype=np.int32)
    out[: len(ptr)] = ptr
    return jnp.asarray(out)


class Buckets(NamedTuple):
    bs: int
    nbp: int        # bucketed block-column count
    poolp: int      # bucketed pool rows
    dlen: int
    llen: int
    ulen: int
    glen: int
    nlvlp: int


def factor_buckets(plan: SymbolicPlan) -> Buckets:
    # Generous lower bounds: every matrix small enough to hit them shares
    # ONE bucket signature, hence one compiled executor. A fresh Mosaic
    # compile through the remote-TPU tunnel costs minutes, so collapsing
    # the small-matrix class into a single canonical shape matters far
    # more than the few MiB of pool padding it costs.
    return Buckets(
        bs=plan.bs,
        nbp=bucket125(plan.nb),
        poolp=bucket_fine(plan.nslots + 2, lo=64),
        dlen=bucket125(plan.nb + 1),
        llen=bucket125(len(plan.l_slots) + 1, lo=64),
        ulen=bucket125(len(plan.u_slots) + 1, lo=64),
        glen=bucket125(len(plan.g_l) + 1, lo=64),
        nlvlp=bucket125(plan.n_flevels),
    )


class FactorTapes(NamedTuple):
    """Device-resident integer schedule, grouped by elimination level.

    ``consts`` carries [zero_slot, trash_slot] so the executor is
    independent of the pool layout.
    """

    consts: jax.Array    # (2,) zero slot, trash slot
    dptr: jax.Array      # (nlvlp+1,) diag-batch ranges
    dstep: jax.Array     # step ids, level-ordered
    dslot: jax.Array     # (nbp+1,) diag slot per step; padding → zero slot
    lptr: jax.Array
    l_slot: jax.Array
    l_step: jax.Array
    uptr: jax.Array
    u_slot: jax.Array
    u_step: jax.Array
    gptr: jax.Array
    g_l: jax.Array
    g_u: jax.Array
    g_t: jax.Array


class SolveTapes(NamedTuple):
    consts: jax.Array    # (2,)
    gptr: jax.Array
    gslot: jax.Array
    gsrc: jax.Array
    gdst: jax.Array
    dptr: jax.Array
    diag: jax.Array


def level_order(plan: SymbolicPlan):
    """Group per-step factor work by elimination level (host side)."""
    nb = plan.nb
    nlvl = plan.n_flevels
    lev = plan.step_level
    order = np.argsort(lev * nb + np.arange(nb), kind="stable")
    dptr = np.zeros(nlvl + 1, dtype=np.int64)
    dptr[1:] = np.cumsum(np.bincount(lev, minlength=nlvl))
    dstep = order.astype(np.int32)

    def regroup(ptr, *fields):
        outs = [np.empty(int(ptr[-1]), dtype=np.int32) for _ in fields]
        steps = np.empty(int(ptr[-1]), dtype=np.int32)
        lptr = np.zeros(nlvl + 1, dtype=np.int64)
        pos = 0
        for l in range(nlvl):
            for k in order[dptr[l]:dptr[l + 1]]:
                lo, hi = int(ptr[k]), int(ptr[k + 1])
                nseg = hi - lo
                for f, out in zip(fields, outs):
                    out[pos:pos + nseg] = f[lo:hi]
                steps[pos:pos + nseg] = k
                pos += nseg
            lptr[l + 1] = pos
        return lptr, outs, steps

    lptr, (l_slot,), l_step = regroup(plan.l_ptr, plan.l_slots)
    uptr, (u_slot,), u_step = regroup(plan.u_ptr, plan.u_slots)
    gptr, (g_l, g_u, g_t), _ = regroup(plan.g_ptr, plan.g_l, plan.g_u,
                                       plan.g_t)
    return dict(dptr=dptr, dstep=dstep, lptr=lptr, l_slot=l_slot,
                l_step=l_step, uptr=uptr, u_slot=u_slot, u_step=u_step,
                gptr=gptr, g_l=g_l, g_u=g_u, g_t=g_t)


def make_factor_tapes(plan: SymbolicPlan) -> FactorTapes:
    z, t = plan.zero_slot, plan.trash_slot
    b = factor_buckets(plan)
    lv = level_order(plan)
    dslot = _pad_to(plan.diag_slot, b.nbp + 1, fill=z)
    return FactorTapes(
        consts=jnp.asarray(np.array([z, t], np.int32)),
        dptr=_pad_ptr(lv["dptr"], b.nlvlp),
        dstep=_pad_to(lv["dstep"], b.dlen, fill=b.nbp),
        dslot=dslot,
        lptr=_pad_ptr(lv["lptr"], b.nlvlp),
        l_slot=_pad_to(lv["l_slot"], b.llen, fill=t),
        l_step=_pad_to(lv["l_step"], b.llen, fill=b.nbp),
        uptr=_pad_ptr(lv["uptr"], b.nlvlp),
        u_slot=_pad_to(lv["u_slot"], b.ulen, fill=t),
        u_step=_pad_to(lv["u_step"], b.ulen, fill=b.nbp),
        gptr=_pad_ptr(lv["gptr"], b.nlvlp),
        g_l=_pad_to(lv["g_l"], b.glen, fill=z),
        g_u=_pad_to(lv["g_u"], b.glen, fill=z),
        g_t=_pad_to(lv["g_t"], b.glen, fill=t),
    )


def make_solve_tapes(plan: SymbolicPlan, which: str) -> SolveTapes:
    p = plan
    nbp = bucket125(p.nb)
    z, t = p.zero_slot, p.trash_slot
    if which == "L":
        gptr, gslot, gsrc, gdst = (p.lsol_gptr, p.lsol_gslot, p.lsol_gsrc,
                                   p.lsol_gdst)
        dptr, diag, nlvl = p.lsol_dptr, p.lsol_diag, p.lsol_nlvl
    else:
        gptr, gslot, gsrc, gdst = (p.usol_gptr, p.usol_gslot, p.usol_gsrc,
                                   p.usol_gdst)
        dptr, diag, nlvl = p.usol_dptr, p.usol_diag, p.usol_nlvl
    nlvlp = bucket125(nlvl)
    glen = bucket125(len(gslot) + 1)
    dlen = bucket125(len(diag) + 1)
    return SolveTapes(
        consts=jnp.asarray(np.array([z, t], np.int32)),
        gptr=_pad_ptr(gptr, nlvlp),
        gslot=_pad_to(gslot, glen, fill=z),
        gsrc=_pad_to(gsrc, glen, fill=0),
        gdst=_pad_to(gdst, glen, fill=nbp),
        dptr=_pad_ptr(dptr, nlvlp),
        diag=_pad_to(diag, dlen, fill=nbp),
    )


def solve_buckets(plan: SymbolicPlan):
    # generous lower bounds: see factor_buckets (one compile per class)
    return (plan.bs, bucket125(plan.nb),
            bucket125(len(plan.lsol_gslot) + 1, lo=64),
            bucket125(len(plan.usol_gslot) + 1, lo=64),
            bucket125(len(plan.lsol_diag) + 1, lo=16),
            bucket125(len(plan.usol_diag) + 1, lo=16),
            bucket125(plan.lsol_nlvl), bucket125(plan.usol_nlvl))


# ---------------------------------------------------------------------------
# dense block LU (diagonal blocks)
# ---------------------------------------------------------------------------

def resolve_gemm_precision(exact: bool, precision=None) -> str:
    """Schur-GEMM pass precision shared by the fused kernels (clk/tck/
    flk): legacy env SLU_TPU_CLK_GEMM_PRECISION force-overrides (it
    historically governed all three kernels), then the driver-resolved
    ``precision``, then exactness default. Mosaic lowers DEFAULT (one
    bf16 pass) and HIGHEST (six) only."""
    import os
    return (os.environ.get("SLU_TPU_CLK_GEMM_PRECISION", "")
            or precision
            or ("highest" if exact else "default"))


_BASE = 8  # unrolled base-case size


def _replace_tiny(piv, thresh):
    """GESP tiny-pivot substitution: |piv|<thresh → sqrt(eps)‖A‖ with the
    pivot's phase (reference: pdgstrf2.c ReplaceTinyPivot)."""
    apiv = jnp.abs(piv)
    bad = apiv < thresh
    unit = jnp.where(apiv > 0,
                     piv / jnp.maximum(apiv, jnp.finfo(apiv.dtype).tiny),
                     jnp.ones_like(piv))
    newpiv = jnp.where(bad, (unit * thresh).astype(piv.dtype), piv)
    return newpiv, bad.astype(jnp.int32)


def _lu_base(A, thresh):
    """Unrolled right-looking LU of a small (m,m) block, no pivoting."""
    m = A.shape[0]
    tiny = jnp.zeros((), jnp.int32)
    for j in range(m):
        piv, bad = _replace_tiny(A[j, j], thresh)
        tiny = tiny + bad
        A = A.at[j, j].set(piv)
        if j + 1 < m:
            col = A[j + 1:, j] / piv
            A = A.at[j + 1:, j].set(col)
            A = A.at[j + 1:, j + 1:].add(-col[:, None] * A[j, j + 1:][None, :])
    return A, tiny


def _lu_base_masked(A, thresh):
    """Scatter-free variant of :func:`_lu_base` (masks + static slices
    only) — the Mosaic TPU lowering has no scatter primitive, so this is
    the base case used inside Pallas kernels. Bit-compatible math."""
    m = A.shape[0]
    rows_i = lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols_i = lax.broadcasted_iota(jnp.int32, (m, m), 1)
    tiny = jnp.zeros((), jnp.int32)
    for j in range(m):
        piv, bad = _replace_tiny(A[j, j], thresh)
        tiny = tiny + bad
        A = jnp.where((rows_i == j) & (cols_i == j), piv, A)
        A = jnp.where((rows_i > j) & (cols_i == j), A / piv, A)
        if j + 1 < m:
            col = jnp.where(rows_i[:, :1] > j, A[:, j:j + 1], 0.0)
            row = jnp.where(cols_i[:1, :] > j, A[j:j + 1, :], 0.0)
            A = A - col * row
    return A, tiny


def _base_invs_masked(LU):
    """Scatter-free, 2D-shaped triangular inverses of a compact-LU block
    (rows built by substitution and stacked — no dynamic-update ops)."""
    m = LU.shape[0]
    eye = jnp.eye(m, dtype=LU.dtype)
    linv_rows = [eye[0:1, :]]
    for i in range(1, m):
        acc = eye[i:i + 1, :]
        for j in range(i):
            acc = acc - LU[i, j] * linv_rows[j]
        linv_rows.append(acc)
    linv = jnp.concatenate(linv_rows, axis=0)
    uinv_rows = [None] * m
    uinv_rows[m - 1] = eye[m - 1:m, :] / LU[m - 1, m - 1]
    for i in range(m - 2, -1, -1):
        acc = eye[i:i + 1, :]
        for j in range(i + 1, m):
            acc = acc - LU[i, j] * uinv_rows[j]
        uinv_rows[i] = acc / LU[i, i]
    uinv = jnp.concatenate(uinv_rows, axis=0)
    return linv, uinv


def _mm(a, b):
    """Full-precision matmul (TPU f32 defaults to bf16 passes otherwise)."""
    return jnp.matmul(a, b, precision=MATMUL_PRECISION)


def _base_invs(LU):
    """Triangular inverses of a small compact-LU block by substitution,
    unrolled at trace time (precision-exact elementwise/VPU ops only)."""
    m = LU.shape[0]
    eye = jnp.eye(m, dtype=LU.dtype)
    linv = [eye[0]]
    for i in range(1, m):
        acc = eye[i]
        for j in range(i):
            acc = acc - LU[i, j] * linv[j]
        linv.append(acc)
    linv = jnp.stack(linv)
    uinv = [None] * m
    uinv[m - 1] = eye[m - 1] / LU[m - 1, m - 1]
    for i in range(m - 2, -1, -1):
        acc = eye[i]
        for j in range(i + 1, m):
            acc = acc - LU[i, j] * uinv[j]
        uinv[i] = acc / LU[i, i]
    uinv = jnp.stack(uinv)
    return linv, uinv


def block_lu_inv(A, thresh, masked: bool = False):
    """Recursive blocked LU with triangular inverses (compact storage:
    unit-L below the diagonal, U on/above).

    Static shapes → the recursion unrolls at trace time; merge steps are
    full-precision MXU matmuls (no XLA TriangularSolve, whose TPU lowering
    is not precision-controlled). Returns (LU, Linv, Uinv, tiny_count).
    The inverses make every panel solve / solve-phase diag application a
    GEMM — the pdCompute_Diag_Inv idea (reference: pdgstrs.c:842).

    ``masked=True`` uses the scatter-free base case so the whole function
    lowers inside a Pallas TPU kernel (Mosaic has no scatter).
    """
    m = A.shape[0]
    if m <= _BASE:
        if masked:
            LU, t = _lu_base_masked(A, thresh)
            linv, uinv = _base_invs_masked(LU)
        else:
            LU, t = _lu_base(A, thresh)
            linv, uinv = _base_invs(LU)
        return LU, linv, uinv, t
    h = m // 2
    LU11, L11i, U11i, t1 = block_lu_inv(A[:h, :h], thresh, masked)
    A12 = _mm(L11i, A[:h, h:])          # L11^{-1} A12
    A21 = _mm(A[h:, :h], U11i)          # A21 U11^{-1}
    S = A[h:, h:] - _mm(A21, A12)
    LU22, L22i, U22i, t2 = block_lu_inv(S, thresh, masked)
    z = jnp.zeros((h, m - h), dtype=A.dtype)
    LU = jnp.concatenate([
        jnp.concatenate([LU11, A12], axis=1),
        jnp.concatenate([A21, LU22], axis=1)], axis=0)
    linv = jnp.concatenate([
        jnp.concatenate([L11i, z], axis=1),
        jnp.concatenate([-_mm(L22i, _mm(A21, L11i)), L22i], axis=1)], axis=0)
    uinv = jnp.concatenate([
        jnp.concatenate([U11i, -_mm(U11i, _mm(A12, U22i))], axis=1),
        jnp.concatenate([z.T, U22i], axis=1)], axis=0)
    return LU, linv, uinv, t1 + t2


def block_lu(A, thresh):
    """Compact blocked LU only (see block_lu_inv)."""
    LU, _, _, t = block_lu_inv(A, thresh)
    return LU, t


# ---------------------------------------------------------------------------
# factorization executor (cached on bucket signature)
# ---------------------------------------------------------------------------


def _chunk_indices(lo, hi, c, chunk, tape_len):
    offs = lo + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
    valid = offs < hi
    offs = jnp.minimum(offs, tape_len - 1)
    return offs, valid


def _make_level_step(b: Buckets, chunk: int, diag_chunk: int):
    """One elimination level of the factorization: diag batch → L-panel
    TRSMs → U-panel TRSMs → Schur GEMM/scatter. Shared by the fused
    whole-factorization executor and the per-level profiled runner."""
    bs, nbp = b.bs, b.nbp
    blu = jax.vmap(block_lu_inv, in_axes=(0, None))

    def level_step(l, carry, thresh, tapes: FactorTapes):
        pool, linv, uinv, tiny = carry
        dtype = pool.dtype
        zs = tapes.consts[0]
        ts = tapes.consts[1]

        lo, hi = tapes.dptr[l], tapes.dptr[l + 1]

        def diag(c, carry):
            pool, linv, uinv, tiny = carry
            offs, valid = _chunk_indices(lo, hi, c, diag_chunk, b.dlen)
            steps = jnp.where(valid, tapes.dstep[offs], nbp)
            dsl = tapes.dslot[steps]           # padding → zero slot
            LU, lk, uk, nt = blu(pool[dsl], thresh)
            pool = pool.at[jnp.where(valid, dsl, ts)].set(LU)
            linv = linv.at[steps].set(lk)      # masked → row nbp
            uinv = uinv.at[steps].set(uk)
            tiny = tiny + jnp.sum(nt * valid).astype(jnp.int32)
            return pool, linv, uinv, tiny

        nch = (hi - lo + diag_chunk - 1) // diag_chunk
        pool, linv, uinv, tiny = lax.fori_loop(
            0, nch, diag, (pool, linv, uinv, tiny))

        llo, lhi = tapes.lptr[l], tapes.lptr[l + 1]

        def ltrsm(c, pool):
            offs, valid = _chunk_indices(llo, lhi, c, chunk, b.llen)
            si = jnp.where(valid, tapes.l_slot[offs], ts)
            st = jnp.where(valid, tapes.l_step[offs], nbp)
            Y = jnp.einsum("cij,cjk->cik", pool[si], uinv[st],
                           preferred_element_type=dtype,
                           precision=MATMUL_PRECISION)
            return pool.at[si].set(Y)

        nch = (lhi - llo + chunk - 1) // chunk
        pool = lax.fori_loop(0, nch, ltrsm, pool)

        ulo, uhi = tapes.uptr[l], tapes.uptr[l + 1]

        def utrsm(c, pool):
            offs, valid = _chunk_indices(ulo, uhi, c, chunk, b.ulen)
            si = jnp.where(valid, tapes.u_slot[offs], ts)
            st = jnp.where(valid, tapes.u_step[offs], nbp)
            Y = jnp.einsum("cij,cjk->cik", linv[st], pool[si],
                           preferred_element_type=dtype,
                           precision=MATMUL_PRECISION)
            return pool.at[si].set(Y)

        nch = (uhi - ulo + chunk - 1) // chunk
        pool = lax.fori_loop(0, nch, utrsm, pool)

        glo, ghi = tapes.gptr[l], tapes.gptr[l + 1]

        def gemm(c, pool):
            offs, valid = _chunk_indices(glo, ghi, c, chunk, b.glen)
            li = jnp.where(valid, tapes.g_l[offs], zs)
            ui = jnp.where(valid, tapes.g_u[offs], zs)
            ti = jnp.where(valid, tapes.g_t[offs], ts)
            P = jnp.einsum("cij,cjk->cik", pool[li], pool[ui],
                           preferred_element_type=dtype,
                           precision=MATMUL_PRECISION)
            return pool.at[ti].add(-P)

        nch = (ghi - glo + chunk - 1) // chunk
        pool = lax.fori_loop(0, nch, gemm, pool)

        return pool, linv, uinv, tiny

    return level_step


def _factor_core(b: Buckets, chunk: int, diag_chunk: int):
    """Level-batched factorization core for one bucket class."""
    bs, nbp = b.bs, b.nbp
    level_step = _make_level_step(b, chunk, diag_chunk)

    def factor(pool, thresh, tapes: FactorTapes):
        dtype = pool.dtype
        linv0 = jnp.zeros((nbp + 1, bs, bs), dtype)
        uinv0 = jnp.zeros((nbp + 1, bs, bs), dtype)

        def level(l, carry):
            return level_step(l, carry, thresh, tapes)

        pool, linv, uinv, tiny = lax.fori_loop(
            0, b.nlvlp, level,
            (pool, linv0, uinv0, jnp.zeros((), jnp.int32)))
        return pool, linv, uinv, tiny

    return factor


@functools.lru_cache(maxsize=128)
def _factor_executor(b: Buckets, chunk: int, diag_chunk: int):
    return jax.jit(_factor_core(b, chunk, diag_chunk), donate_argnums=(0,))


# The TPU runtime's default layout for a (slots, B, B) pool transferred or
# scattered at a jit boundary does NOT match the layout XLA's assignment
# picks for the factor loop carry (observed: (1,2,0) / (2,1,0) entries vs a
# (0,1,2)-class carry). The mismatch silently rejects the pool donation and
# inserts TWO full-pool layout-conversion copies into the executable
# (measured: peak temp = 2.02x pool — the n=1e6 pool is 12.9 GiB, so the
# copies alone OOM a 16 GiB chip). Explicitly pinning boundary layouts
# (jax.experimental.layout.Format) is not reliably honored through this
# remote-compile stack. Two routes avoid the copies; the DEFAULT capacity
# route (driver.py _device_factor) is the separated path — init_pool's
# device scatter + the donated-pool executor below, which measured
# copy-free at n=885k. build_factor_values_fn is the opt-in
# (SLU_TPU_FUSED_INIT=1) fused variant: one executable scatters the nnz
# value stream into a fresh pool and factors it in place, removing the
# boundary entirely — useful when a future toolchain regresses the
# donated-path layouts. Both are the analog of the reference's
# factor-in-place storage discipline (dLocalLU_t,
# superlu_ddefs.h:97-307 — never two copies of the factors).


def _values_factor_core(b: Buckets, chunk: int, diag_chunk: int):
    core = _factor_core(b, chunk, diag_chunk)
    bs = b.bs

    def factor_values(slot, off, vals, thresh, tapes: FactorTapes):
        # Same two layout rules as _pool_scatter_device: scatter directly
        # in the 3D (poolp, bs, bs) shape (a flat scatter + reshape makes
        # XLA materialize the pool twice — 13.3 GiB temp at n=885k), and
        # chunk the update stream so the sort-lowering temps are bounded
        # by the chunk, not the nnz. staged_values pads the stream to a
        # chunk multiple with trash-slot zero-adds.
        r = off // bs
        c = off % bs
        pool = jnp.zeros((b.poolp, bs, bs), vals.dtype)
        n = slot.shape[0]
        ch = min(_INIT_SCATTER_CHUNK, n)

        def body(i, pool):
            sl = lax.dynamic_slice(slot, (i * ch,), (ch,))
            rr = lax.dynamic_slice(r, (i * ch,), (ch,))
            cc = lax.dynamic_slice(c, (i * ch,), (ch,))
            vv = lax.dynamic_slice(vals, (i * ch,), (ch,))
            # staged_values ships the stream sorted with unique real
            # cells — the flags let XLA skip its sort/dedup lowering
            return pool.at[sl, rr, cc].add(vv, unique_indices=True,
                                           indices_are_sorted=True)

        pool = lax.fori_loop(0, -(-n // ch), body, pool)
        return core(pool, thresh, tapes)

    return factor_values


@functools.lru_cache(maxsize=128)
def _values_factor_executor(b: Buckets, chunk: int, diag_chunk: int):
    # plain jit: with the pool internal to the program, XLA picks ONE
    # layout for the zeros→scatter→factor-carry→output chain and inserts
    # no copies; requesting explicit/AUTO boundary layouts is NOT honored
    # reliably by this remote-compile stack and corrupts buffer metadata
    return jax.jit(_values_factor_core(b, chunk, diag_chunk))


def staged_values(plan: SymbolicPlan, a_data, dtype):
    """(slot, off, vals) device triple for build_factor_values_fn: the A
    values, the padding-diagonal ones, and bucket-pad zeros aimed at the
    trash slot (scatter-adding 0 is a no-op), so one compile serves every
    matrix in the (plan-bucket, nnz-bucket) class.

    The stream ships SORTED by flat pool index (a one-time host argsort
    at staging): every real cell is written exactly once, so the device
    scatter runs with unique+sorted index guarantees — measured 20 →
    15 ms at lap3d50 (7M updates into a 1.25 GiB pool). Trash-slot pads
    land after every real index and add 0.0 (value-neutral even though
    they repeat one cell)."""
    vals = np.asarray(a_data, dtype=dtype)
    bb = plan.bs * plan.bs
    idx = np.asarray(plan.init_idx)
    o = np.argsort(idx, kind="stable")
    npad = bucket125(len(idx) + 1)
    if npad > _INIT_SCATTER_CHUNK:
        # the fused core slices the stream in _INIT_SCATTER_CHUNK pieces;
        # a non-multiple length would make the clamped tail re-add values
        npad = -(-npad // _INIT_SCATTER_CHUNK) * _INIT_SCATTER_CHUNK
    slot = np.full(npad, plan.trash_slot, dtype=np.int32)
    off = np.zeros(npad, dtype=np.int32)
    slot[: len(idx)] = idx[o] // bb
    off[: len(idx)] = idx[o] % bb
    v = np.zeros(npad, dtype=dtype)
    v[: len(vals)] = vals
    if plan.init_ones:
        v[len(vals): len(idx)] = 1
    v[: len(idx)] = v[: len(idx)][o]
    return jnp.asarray(slot), jnp.asarray(off), jnp.asarray(v)


def build_factor_values_fn(plan: SymbolicPlan, *, chunk: int = 32,
                           diag_chunk: int = 8):
    """Fused scatter-init + factorization executor.

    ``factor((slot, off, vals), thresh, tapes) -> (pool, linv, uinv,
    tiny)`` where the triple comes from :func:`staged_values`. The pool
    never crosses a jit boundary on the way in, so no layout-conversion
    copies exist and peak memory is ONE pool (+ small temps) — required
    for million-row single-chip factorizations.
    """
    inner = _values_factor_executor(factor_buckets(plan), chunk, diag_chunk)

    def factor(triple, thresh, tapes):
        slot, off, vals = triple
        return inner(slot, off, vals, thresh, tapes)

    return factor


@functools.lru_cache(maxsize=32)
def _level_executor(b: Buckets, chunk: int, diag_chunk: int):
    step = _make_level_step(b, chunk, diag_chunk)

    def one(pool, linv, uinv, tiny, l, thresh, tapes):
        return step(l, (pool, linv, uinv, tiny), thresh, tapes)

    # level index l is traced → ONE compile serves every level
    return jax.jit(one, donate_argnums=(0, 1, 2, 3))


def profile_factor_levels(plan: SymbolicPlan, a_data, dtype, thresh, *,
                          chunk: int = 32, diag_chunk: int = 8):
    """Per-elimination-level device timing of the factorization — the
    fine-grain profiler role of the reference's SCT_t counters
    (reference: SRC/include/superlu_defs.h SCT_t, dSchCompUdt timing in
    dSchCompUdt-2Ddynamic.c). Runs the same tape one level per dispatch
    (so each level's wall time includes one dispatch + sync through the
    device link — use relative shape, not absolute sums).

    Returns ``(rows, (pool, linv, uinv, tiny))`` where rows is a list of
    dicts: level, ms, steps, lpanels, upanels, gemms, gflops_model.
    """
    import time as _time
    b = factor_buckets(plan)
    tapes = make_factor_tapes(plan)
    pool = init_pool(plan, a_data, dtype)
    linv = jnp.zeros((b.nbp + 1, b.bs, b.bs), pool.dtype)
    uinv = jnp.zeros_like(linv)
    tiny = jnp.zeros((), jnp.int32)
    one = _level_executor(b, chunk, diag_chunk)
    lv = level_order(plan)
    th = jnp.asarray(thresh, dtype=np.dtype(dtype))
    b3 = float(plan.bs) ** 3
    rows = []
    for l in range(plan.n_flevels):
        t0 = _time.perf_counter()
        pool, linv, uinv, tiny = one(pool, linv, uinv, tiny,
                                     jnp.int32(l), th, tapes)
        jax.block_until_ready(pool)
        dt = _time.perf_counter() - t0
        steps = int(lv["dptr"][l + 1] - lv["dptr"][l])
        lp = int(lv["lptr"][l + 1] - lv["lptr"][l])
        up = int(lv["uptr"][l + 1] - lv["uptr"][l])
        gm = int(lv["gptr"][l + 1] - lv["gptr"][l])
        fl = (2.0 / 3.0) * b3 * steps + b3 * (lp + up) + 2.0 * b3 * gm
        rows.append(dict(level=l, ms=dt * 1e3, steps=steps, lpanels=lp,
                         upanels=up, gemms=gm,
                         gflops_model=fl / max(dt, 1e-12) / 1e9))
    return rows, (pool, linv, uinv, tiny)


def build_factor_core(plan: SymbolicPlan, *, chunk: int = 32,
                      diag_chunk: int = 8):
    """Unjitted factorization core (vmap-able for the batched interface)."""
    return _factor_core(factor_buckets(plan), chunk, diag_chunk)


def build_factor_fn(plan: SymbolicPlan, *, chunk: int = 32,
                    diag_chunk: int = 8):
    """Bucket-cached compiled executor for this plan's size class.

    Returns ``factor(pool, thresh, tapes) -> (pool, linv, uinv, tiny)``.
    ``pool`` must be bucket-padded (see init_pool); linv/uinv come back with
    nbp+1 rows — rows [0, nb) are valid.
    """
    return _factor_executor(factor_buckets(plan), chunk, diag_chunk)


# ---------------------------------------------------------------------------
# triangular solves (level-set sweeps), cached on bucket signature
# ---------------------------------------------------------------------------


def _solve_core(bs, nbp, gl_len, gu_len, dl_len, du_len, nlvl_l, nlvl_u,
                nrhs, chunk, transpose=False):
    # transpose mode multiplies by the stored blocks' transposes (the
    # A^T x = b path: forward U^T sweep then backward L^T sweep)
    spec = "cji,cjk->cik" if transpose else "cij,cjk->cik"

    def sweep(pool, dinv, tape: SolveTapes, X, nlvl, glen, dlen, zs):
        dtype = X.dtype

        def level(l, X):
            lo, hi = tape.gptr[l], tape.gptr[l + 1]

            def gemm(c, X):
                offs, valid = _chunk_indices(lo, hi, c, chunk, glen)
                si = jnp.where(valid, tape.gslot[offs], zs)
                src = jnp.where(valid, tape.gsrc[offs], 0)
                dst = jnp.where(valid, tape.gdst[offs], nbp)
                P = jnp.einsum(spec, pool[si], X[src],
                               preferred_element_type=dtype,
                               precision=MATMUL_PRECISION)
                return X.at[dst].add(-P)

            nch = (hi - lo + chunk - 1) // chunk
            X = lax.fori_loop(0, nch, gemm, X)

            dlo, dhi = tape.dptr[l], tape.dptr[l + 1]

            def diag(c, X):
                offs, valid = _chunk_indices(dlo, dhi, c, chunk, dlen)
                I = jnp.where(valid, tape.diag[offs], nbp)
                Ic = jnp.minimum(I, nbp - 1)
                Y = jnp.einsum(spec, dinv[Ic], X[I],
                               preferred_element_type=dtype,
                               precision=MATMUL_PRECISION)
                return X.at[I].set(Y)

            nchd = (dhi - dlo + chunk - 1) // chunk
            return lax.fori_loop(0, nchd, diag, X)

        return lax.fori_loop(0, nlvl, level, X)

    def solve(pool, linv, uinv, ltape: SolveTapes, utape: SolveTapes, b):
        X = b.reshape(nbp, bs, nrhs)
        X = jnp.concatenate([X, jnp.zeros((1, bs, nrhs), X.dtype)], axis=0)
        X = sweep(pool, linv, ltape, X, nlvl_l, gl_len, dl_len,
                  ltape.consts[0])
        X = sweep(pool, uinv, utape, X, nlvl_u, gu_len, du_len,
                  utape.consts[0])
        return X[:nbp].reshape(nbp * bs, nrhs)

    return solve


@functools.lru_cache(maxsize=128)
def _solve_executor(key, nrhs, chunk):
    return jax.jit(_solve_core(*key, nrhs, chunk))


def build_solve_core(plan: SymbolicPlan, nrhs: int, *, chunk: int = 32):
    return _solve_core(*solve_buckets(plan), nrhs, chunk)


def build_solve_fn(plan: SymbolicPlan, nrhs: int, *, chunk: int = 32):
    """Bucket-cached compiled level-set solve.

    ``b`` must be padded to (nbp·bs, nrhs) in factorization coordinates;
    returns the same padded shape.
    """
    return _solve_executor(solve_buckets(plan), nrhs, chunk)


# ---------------------------------------------------------------------------
# pool initialization
# ---------------------------------------------------------------------------


# Pools at or above this byte size are assembled ON the device: the host
# ships only (nnz) values + (slot, offset) index pairs and one jitted
# scatter-add builds the pool in HBM. Below it, the host numpy scatter +
# one device_put wins (no XLA compile per (pool, nnz) shape signature —
# measured ~5s each on the TPU). The crossover is transfer-bound: a 4.3 GiB
# lap3d50 pool took ~50s of DIST over the device link, vs ~8 MiB of
# indices. Analog of the reference's owner-computed pddistribute
# (SRC/double/pddistribute.c:66-433): never materialize global storage.
_INIT_DEVICE_MIN_BYTES = int(_os.environ.get(
    "SLU_TPU_INIT_DEVICE_BYTES", 256 << 20))


#: updates per scatter dispatch inside the init loop (bounds the
#: sort-based TPU scatter lowering's temp memory to ~1 GiB at B=128)
_INIT_SCATTER_CHUNK = 1 << 20


@functools.partial(jax.jit, static_argnames=("poolp", "bs", "dtype",
                                             "sorted_unique"))
def _pool_scatter_device(slot, off, vals, poolp, bs, dtype,
                         sorted_unique: bool = False):
    """``sorted_unique=True`` (streams from :func:`staged_values`): one
    whole-stream scatter with unique+sorted guarantees — XLA skips its
    sort/dedup lowering entirely, so the chunking (whose purpose is to
    bound sort temps) is unnecessary. Measured 20 → 15 ms at lap3d50."""
    if sorted_unique:
        r = off // bs
        c = off % bs
        pool = jnp.zeros((poolp, bs, bs), dtype)
        return pool.at[slot, r, c].add(vals.astype(dtype),
                                       unique_indices=True,
                                       indices_are_sorted=True)
    return _pool_scatter_chunked(slot, off, vals, poolp, bs, dtype)


def _pool_scatter_chunked(slot, off, vals, poolp, bs, dtype):
    # Two structural choices keep the init peak at ~1.08x the pool — a
    # flat (poolp, bs*bs) scatter + reshape forced XLA to materialize
    # the pool TWICE (the 3D layout it picks is not reshape-compatible
    # with {1,0}; measured 13.3 GiB temp at n=885k/B=128), and a single
    # whole-stream scatter costs ~3.6 GiB of sort-lowering temps:
    #   1. scatter directly in the 3D pool shape (slot, row, col);
    #   2. chunk the update stream through a fori_loop so the sort
    #      temps are bounded by the chunk, not the nnz.
    # The caller pads the stream to a chunk multiple with zero-adds.
    r = off // bs
    c = off % bs
    pool = jnp.zeros((poolp, bs, bs), dtype)
    n = slot.shape[0]
    ch = min(_INIT_SCATTER_CHUNK, n)

    def body(i, pool):
        sl = lax.dynamic_slice(slot, (i * ch,), (ch,))
        rr = lax.dynamic_slice(r, (i * ch,), (ch,))
        cc = lax.dynamic_slice(c, (i * ch,), (ch,))
        vv = lax.dynamic_slice(vals, (i * ch,), (ch,))
        return pool.at[sl, rr, cc].add(vv.astype(dtype))

    return lax.fori_loop(0, -(-n // ch), body, pool)


def init_pool(plan: SymbolicPlan, a_data, dtype) -> jax.Array:
    """Scatter the (permuted, scaled) matrix values into the bucket-padded
    block pool. ``a_data`` must be in the CSC data order of the matrix the
    plan was built from; padding diagonal entries get 1.0.

    Small pools are scattered in numpy and shipped with one device_put;
    large pools are built on-device from the compact (values, indices)
    stream (see _INIT_DEVICE_MIN_BYTES)."""
    b = factor_buckets(plan)
    vals = np.asarray(a_data, dtype=dtype)
    bb = plan.bs * plan.bs
    idx = np.asarray(plan.init_idx)
    nbytes = b.poolp * bb * vals.dtype.itemsize
    if nbytes >= _INIT_DEVICE_MIN_BYTES:
        # full update stream = A values + padding-diagonal ones, padded
        # to a scatter-chunk multiple with zero-adds (no-ops)
        n_upd = len(idx)
        npad = n_upd if n_upd <= _INIT_SCATTER_CHUNK else \
            -(-n_upd // _INIT_SCATTER_CHUNK) * _INIT_SCATTER_CHUNK
        slot = np.zeros(npad, dtype=np.int32)
        off = np.zeros(npad, dtype=np.int32)
        slot[:n_upd] = idx // bb
        off[:n_upd] = idx % bb
        v = np.zeros(npad, dtype=dtype)
        v[: len(vals)] = vals
        if plan.init_ones:
            v[len(vals): n_upd] = 1
        return _pool_scatter_device(
            jnp.asarray(slot), jnp.asarray(off), jnp.asarray(v),
            b.poolp, plan.bs, jnp.dtype(dtype))
    flat = np.zeros(b.poolp * bb, dtype=dtype)
    np.add.at(flat, idx[: len(vals)], vals)
    if plan.init_ones:
        flat[idx[len(vals):]] += 1
    return jax.device_put(flat.reshape(b.poolp, plan.bs, plan.bs))


# ---------------------------------------------------------------------------
# transpose solve (A^T x = b): U^T forward sweep then L^T backward sweep
# ---------------------------------------------------------------------------


def _trans_schedule(plan: SymbolicPlan, which: str):
    """Level schedule for the transposed sweep.

    U^T forward: for each U block (I,J) the unknown z_J depends on z_I
    (I<J); L^T backward: w_J depends on w_I for L blocks (I,J), I>J.
    """
    nb = plan.nb
    deps = [[] for _ in range(nb)]   # dst J -> [(slot, src I)]
    if which == "U":
        for k in range(nb):
            for s in plan.u_slots[plan.u_ptr[k]:plan.u_ptr[k + 1]]:
                deps[int(plan.slot_col[s])].append((int(s),
                                                    int(plan.slot_row[s])))
        order = range(nb)
    else:
        for k in range(nb):
            for s in plan.l_slots[plan.l_ptr[k]:plan.l_ptr[k + 1]]:
                deps[int(plan.slot_col[s])].append((int(s),
                                                    int(plan.slot_row[s])))
        order = range(nb - 1, -1, -1)
    level = np.zeros(nb, dtype=np.int64)
    for J in order:
        if deps[J]:
            level[J] = max(level[I] for _, I in deps[J]) + 1
    nlvl = int(level.max()) + 1 if nb else 1
    gs, gr, gd, glev = [], [], [], []
    for J in range(nb):
        for s, I in deps[J]:
            gs.append(s)
            gr.append(I)
            gd.append(J)
            glev.append(level[J])
    gs = np.asarray(gs, dtype=np.int32)
    gr = np.asarray(gr, dtype=np.int32)
    gd = np.asarray(gd, dtype=np.int32)
    glev = np.asarray(glev, dtype=np.int64)
    o = np.argsort(glev, kind="stable")
    gptr = np.zeros(nlvl + 1, dtype=np.int64)
    gcnt = np.bincount(glev, minlength=nlvl) if len(glev) else \
        np.zeros(nlvl, np.int64)
    gptr[1:] = np.cumsum(gcnt)
    dptr = np.zeros(nlvl + 1, dtype=np.int64)
    dptr[1:] = np.cumsum(np.bincount(level, minlength=nlvl))
    diag = np.argsort(level, kind="stable").astype(np.int32)
    return (gptr, gs[o] if len(o) else gs, gr[o] if len(o) else gr,
            gd[o] if len(o) else gd, dptr, diag, nlvl)


def make_trans_solve_tapes(plan: SymbolicPlan, which: str) -> SolveTapes:
    gptr, gs, gr, gd, dptr, diag, nlvl = _trans_schedule(plan, which)
    nbp = bucket125(plan.nb)
    z, t = plan.zero_slot, plan.trash_slot
    return SolveTapes(
        consts=jnp.asarray(np.array([z, t], np.int32)),
        gptr=_pad_ptr(gptr, bucket125(nlvl)),
        gslot=_pad_to(gs, bucket125(len(gs) + 1), fill=z),
        gsrc=_pad_to(gr, bucket125(len(gs) + 1), fill=0),
        gdst=_pad_to(gd, bucket125(len(gs) + 1), fill=nbp),
        dptr=_pad_ptr(dptr, bucket125(nlvl)),
        diag=_pad_to(diag, bucket125(len(diag) + 1), fill=nbp),
    )


def trans_solve_buckets(plan: SymbolicPlan):
    gpu, gsu, *_r, du, dgu, nlu = _trans_schedule(plan, "U")
    gpl, gsl, *_r2, dl, dgl, nll = _trans_schedule(plan, "L")
    return (plan.bs, bucket125(plan.nb),
            bucket125(len(gsu) + 1), bucket125(len(gsl) + 1),
            bucket125(len(dgu) + 1), bucket125(len(dgl) + 1),
            bucket125(nlu), bucket125(nll))


@functools.lru_cache(maxsize=128)
def _trans_solve_executor(key, nrhs, chunk):
    return jax.jit(_solve_core(*key, nrhs, chunk, transpose=True))


def build_trans_solve_fn(plan: SymbolicPlan, nrhs: int, *, chunk: int = 32):
    """A^T x = b executor. Call as
    ``solve(pool, uinv, linv, utape_t, ltape_t, b)`` — the U^T forward
    sweep runs first with the transposed upper inverses, then the L^T
    backward sweep (reference analog: the trans branches of pdgstrs)."""
    return _trans_solve_executor(trans_solve_buckets(plan), nrhs, chunk)
