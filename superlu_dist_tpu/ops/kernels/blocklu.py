"""Device block-sparse LU: tape-driven factorization + level-set solves.

TPU-native replacement for the reference's numeric core:

- the elimination loop of ``pdgstrf`` (reference: SRC/double/pdgstrf.c:243-2003)
  becomes a single compiled ``lax.fori_loop`` over block columns;
- panel factorization + TRSMs (pdgstrf2.c:142-360, pdgstrs2_omp) become an
  unrolled recursive block LU (no pivoting, ReplaceTinyPivot semantics) plus
  diagonal-block inverses, so the panel solves are batched GEMMs — the
  DiagInv idea of pdCompute_Diag_Inv (pdgstrs.c:842) applied everywhere;
- the Schur-complement GEMM + OpenMP scatter (dSchCompUdt-2Ddynamic.c:488-705,
  dscatter.c) becomes gather → batched B×B GEMM → indexed scatter-add on a
  flat block pool, with all indices precomputed by the symbolic phase;
- the message-driven triangular solves (pdgstrs.c:1039-3200,
  pdgstrs_lsum.c dlsum_fmod/bmod) become static level-set sweeps.

Everything is static shapes: per-step variable work is chunked into
fixed-size batches; masked lanes read the zero block and write to a trash
block, so one compiled program serves every step.
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


class FactorTapes(NamedTuple):
    """Device-resident integer schedule, grouped by elimination level.

    Steps within a level are independent (see SymbolicPlan.step_level) and
    execute as one batch: batched diagonal LUs, batched panel TRSMs against
    gathered per-step diagonal inverses, batched Schur GEMMs. This is the
    static analog of the reference's look-ahead pipeline — instead of
    overlapping communication of step k+1 with updates of step k via MPI
    tags (pdgstrf.c:1110-1300), every independent step is fused into one
    superstep of MXU work.
    """

    dptr: jax.Array      # (nlvl+1,) diag-batch ranges
    dstep: jax.Array     # step ids, level-ordered (padded, fill=nb)
    dslot: jax.Array     # (nb+1,) diag slot per step, [nb] = zero_slot
    lptr: jax.Array      # (nlvl+1,)
    l_slot: jax.Array    # L-panel block slots, level-ordered
    l_step: jax.Array    # owning step of each L-panel block
    uptr: jax.Array
    u_slot: jax.Array
    u_step: jax.Array
    gptr: jax.Array      # (nlvl+1,)
    g_l: jax.Array
    g_u: jax.Array
    g_t: jax.Array


class SolveTapes(NamedTuple):
    gptr: jax.Array
    gslot: jax.Array
    gsrc: jax.Array
    gdst: jax.Array
    dptr: jax.Array
    diag: jax.Array


def _pad1(a, fill=0, dtype=np.int32):
    """1-padded copy so clipped gathers past the end stay in bounds."""
    a = np.asarray(a, dtype=dtype)
    return jnp.asarray(np.concatenate([a, np.array([fill], dtype=dtype)]))


def level_order(plan: SymbolicPlan):
    """Group per-step factor work by elimination level (host side).

    Returns dict of numpy arrays matching FactorTapes semantics.
    """
    nb = plan.nb
    nlvl = plan.n_flevels
    lev = plan.step_level
    # steps per level, ascending step id within a level
    order = np.argsort(lev * nb + np.arange(nb), kind="stable")
    dptr = np.zeros(nlvl + 1, dtype=np.int64)
    dptr[1:] = np.cumsum(np.bincount(lev, minlength=nlvl))
    dstep = order.astype(np.int32)

    def regroup(ptr, *fields):
        """Reorder per-step segments into level order, with step tags."""
        outs = [np.empty(int(ptr[-1]), dtype=np.int32) for _ in fields]
        steps = np.empty(int(ptr[-1]), dtype=np.int32)
        lptr = np.zeros(nlvl + 1, dtype=np.int64)
        pos = 0
        for l in range(nlvl):
            for k in order[dptr[l]:dptr[l + 1]]:
                lo, hi = int(ptr[k]), int(ptr[k + 1])
                n = hi - lo
                for f, out in zip(fields, outs):
                    out[pos:pos + n] = f[lo:hi]
                steps[pos:pos + n] = k
                pos += n
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
    z = plan.zero_slot
    lv = level_order(plan)
    dslot = np.concatenate([plan.diag_slot.astype(np.int32),
                            np.array([z], np.int32)])
    return FactorTapes(
        dptr=jnp.asarray(lv["dptr"], jnp.int32),
        dstep=_pad1(lv["dstep"], fill=plan.nb),
        dslot=jnp.asarray(dslot),
        lptr=jnp.asarray(lv["lptr"], jnp.int32),
        l_slot=_pad1(lv["l_slot"], fill=z),
        l_step=_pad1(lv["l_step"], fill=plan.nb),
        uptr=jnp.asarray(lv["uptr"], jnp.int32),
        u_slot=_pad1(lv["u_slot"], fill=z),
        u_step=_pad1(lv["u_step"], fill=plan.nb),
        gptr=jnp.asarray(lv["gptr"], jnp.int32),
        g_l=_pad1(lv["g_l"], fill=z),
        g_u=_pad1(lv["g_u"], fill=z),
        g_t=_pad1(lv["g_t"], fill=z),
    )


def make_solve_tapes(plan: SymbolicPlan, which: str) -> SolveTapes:
    p = plan
    if which == "L":
        return SolveTapes(
            gptr=jnp.asarray(p.lsol_gptr, jnp.int32),
            gslot=_pad1(p.lsol_gslot, fill=p.zero_slot),
            gsrc=_pad1(p.lsol_gsrc, fill=0),
            gdst=_pad1(p.lsol_gdst, fill=p.nb),
            dptr=jnp.asarray(p.lsol_dptr, jnp.int32),
            diag=_pad1(p.lsol_diag, fill=p.nb),
        )
    return SolveTapes(
        gptr=jnp.asarray(p.usol_gptr, jnp.int32),
        gslot=_pad1(p.usol_gslot, fill=p.zero_slot),
        gsrc=_pad1(p.usol_gsrc, fill=0),
        gdst=_pad1(p.usol_gdst, fill=p.nb),
        dptr=jnp.asarray(p.usol_dptr, jnp.int32),
        diag=_pad1(p.usol_diag, fill=p.nb),
    )


# ---------------------------------------------------------------------------
# dense block LU (diagonal blocks)
# ---------------------------------------------------------------------------

_BASE = 8  # unrolled base-case size


def _replace_tiny(piv, thresh):
    """GESP tiny-pivot substitution: |piv|<thresh → sqrt(eps)‖A‖ with the
    pivot's phase (reference: pdgstrf2.c ReplaceTinyPivot)."""
    apiv = jnp.abs(piv)
    bad = apiv < thresh
    unit = jnp.where(apiv > 0, piv / jnp.maximum(apiv, jnp.finfo(apiv.dtype).tiny),
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


def _mm(a, b):
    """Full-precision matmul (TPU f32 defaults to bf16 passes otherwise)."""
    return jnp.matmul(a, b, precision=MATMUL_PRECISION)


def _base_invs(LU):
    """Triangular inverses of a small compact-LU block by substitution,
    unrolled at trace time (precision-exact elementwise/VPU ops only)."""
    m = LU.shape[0]
    eye = jnp.eye(m, dtype=LU.dtype)
    # unit-lower inverse: row i = e_i − Σ_{j<i} L[i,j] · row j
    linv = [eye[0]]
    for i in range(1, m):
        acc = eye[i]
        for j in range(i):
            acc = acc - LU[i, j] * linv[j]
        linv.append(acc)
    linv = jnp.stack(linv)
    # upper inverse: row i = (e_i − Σ_{j>i} U[i,j] · row j) / U[i,i]
    uinv = [None] * m
    uinv[m - 1] = eye[m - 1] / LU[m - 1, m - 1]
    for i in range(m - 2, -1, -1):
        acc = eye[i]
        for j in range(i + 1, m):
            acc = acc - LU[i, j] * uinv[j]
        uinv[i] = acc / LU[i, i]
    uinv = jnp.stack(uinv)
    return linv, uinv


def block_lu_inv(A, thresh):
    """Recursive blocked LU with triangular inverses (compact storage:
    unit-L below the diagonal, U on/above).

    Static shapes → the recursion unrolls at trace time; merge steps are
    full-precision MXU matmuls (no XLA TriangularSolve, whose TPU lowering
    is not precision-controlled). Returns (LU, Linv, Uinv, tiny_count).
    The inverses make every panel solve / solve-phase diag application a
    GEMM — the pdCompute_Diag_Inv idea (reference: pdgstrs.c:842).
    """
    m = A.shape[0]
    if m <= _BASE:
        LU, t = _lu_base(A, thresh)
        linv, uinv = _base_invs(LU)
        return LU, linv, uinv, t
    h = m // 2
    LU11, L11i, U11i, t1 = block_lu_inv(A[:h, :h], thresh)
    A12 = _mm(L11i, A[:h, h:])          # L11^{-1} A12
    A21 = _mm(A[h:, :h], U11i)          # A21 U11^{-1}
    S = A[h:, h:] - _mm(A21, A12)
    LU22, L22i, U22i, t2 = block_lu_inv(S, thresh)
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
# factorization executor
# ---------------------------------------------------------------------------


def _chunk_indices(lo, hi, c, chunk, tape_len):
    offs = lo + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
    valid = offs < hi
    offs = jnp.minimum(offs, tape_len - 1)
    return offs, valid


def build_factor_fn(plan: SymbolicPlan, *, chunk: int = 32,
                    diag_chunk: int = 8):
    """Compile the level-batched factorization executor for one plan.

    Returns ``factor(pool, thresh, tapes) -> (pool, linv, uinv, tiny)``
    where ``pool`` is the (nslots+2, B, B) block pool initialized with A and
    ``thresh`` the tiny-pivot threshold (sqrt(eps)·‖A‖). One ``fori_loop``
    over elimination levels; per level: batched diagonal LU+inverses,
    batched panel TRSMs, batched Schur GEMMs.
    """
    nb, bs = plan.nb, plan.bs
    nlvl = plan.n_flevels
    lv = level_order(plan)
    dlen = nb + 1
    llen = len(lv["l_slot"]) + 1
    ulen = len(lv["u_slot"]) + 1
    glen = len(lv["g_l"]) + 1
    zero_slot, trash_slot = plan.zero_slot, plan.trash_slot
    blu = jax.vmap(block_lu_inv, in_axes=(0, None))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def factor(pool, thresh, tapes: FactorTapes):
        dtype = pool.dtype
        linv0 = jnp.zeros((nb + 1, bs, bs), dtype)
        uinv0 = jnp.zeros((nb + 1, bs, bs), dtype)

        def level(l, carry):
            pool, linv, uinv, tiny = carry

            # --- batched diagonal factorization + inverses ---
            lo, hi = tapes.dptr[l], tapes.dptr[l + 1]

            def diag(c, carry):
                pool, linv, uinv, tiny = carry
                offs, valid = _chunk_indices(lo, hi, c, diag_chunk, dlen)
                steps = jnp.where(valid, tapes.dstep[offs], nb)
                dsl = tapes.dslot[steps]           # masked → zero block
                LU, lk, uk, nt = blu(pool[dsl], thresh)
                pool = pool.at[jnp.where(valid, dsl, trash_slot)].set(LU)
                linv = linv.at[steps].set(lk)      # masked → row nb
                uinv = uinv.at[steps].set(uk)
                tiny = tiny + jnp.sum(nt * valid).astype(jnp.int32)
                return pool, linv, uinv, tiny

            nch = (hi - lo + diag_chunk - 1) // diag_chunk
            pool, linv, uinv, tiny = lax.fori_loop(
                0, nch, diag, (pool, linv, uinv, tiny))

            # --- L panels: X <- X @ U_kk^{-1}, per-block step gather ---
            llo, lhi = tapes.lptr[l], tapes.lptr[l + 1]

            def ltrsm(c, pool):
                offs, valid = _chunk_indices(llo, lhi, c, chunk, llen)
                si = jnp.where(valid, tapes.l_slot[offs], trash_slot)
                st = jnp.where(valid, tapes.l_step[offs], nb)
                Y = jnp.einsum("cij,cjk->cik", pool[si], uinv[st],
                               preferred_element_type=dtype,
                               precision=MATMUL_PRECISION)
                return pool.at[si].set(Y)

            nch = (lhi - llo + chunk - 1) // chunk
            pool = lax.fori_loop(0, nch, ltrsm, pool)

            # --- U panels: X <- L_kk^{-1} @ X ---
            ulo, uhi = tapes.uptr[l], tapes.uptr[l + 1]

            def utrsm(c, pool):
                offs, valid = _chunk_indices(ulo, uhi, c, chunk, ulen)
                si = jnp.where(valid, tapes.u_slot[offs], trash_slot)
                st = jnp.where(valid, tapes.u_step[offs], nb)
                Y = jnp.einsum("cij,cjk->cik", linv[st], pool[si],
                               preferred_element_type=dtype,
                               precision=MATMUL_PRECISION)
                return pool.at[si].set(Y)

            nch = (uhi - ulo + chunk - 1) // chunk
            pool = lax.fori_loop(0, nch, utrsm, pool)

            # --- Schur updates: pool[t] -= L(I,k) @ U(k,J), batched ---
            glo, ghi = tapes.gptr[l], tapes.gptr[l + 1]

            def gemm(c, pool):
                offs, valid = _chunk_indices(glo, ghi, c, chunk, glen)
                li = jnp.where(valid, tapes.g_l[offs], zero_slot)
                ui = jnp.where(valid, tapes.g_u[offs], zero_slot)
                ti = jnp.where(valid, tapes.g_t[offs], trash_slot)
                P = jnp.einsum("cij,cjk->cik", pool[li], pool[ui],
                               preferred_element_type=dtype,
                               precision=MATMUL_PRECISION)
                return pool.at[ti].add(-P)

            nch = (ghi - glo + chunk - 1) // chunk
            pool = lax.fori_loop(0, nch, gemm, pool)

            return pool, linv, uinv, tiny

        pool, linv, uinv, tiny = lax.fori_loop(
            0, nlvl, level, (pool, linv0, uinv0, jnp.zeros((), jnp.int32)))
        return pool, linv[:nb], uinv[:nb], tiny

    return factor


# ---------------------------------------------------------------------------
# triangular solves (level-set sweeps)
# ---------------------------------------------------------------------------


def build_solve_fn(plan: SymbolicPlan, nrhs: int, *, chunk: int = 32):
    """Compile ``solve(pool, linv, uinv, ltape, utape, b) -> x`` for one plan.

    ``b``: (n_pad, nrhs) right-hand sides already permuted/scaled into
    factorization coordinates. Static level-set sweep, all GEMMs.
    """
    nb, bs = plan.nb, plan.bs
    gl_len = len(plan.lsol_gslot) + 1
    gu_len = len(plan.usol_gslot) + 1
    dl_len = len(plan.lsol_diag) + 1
    du_len = len(plan.usol_diag) + 1
    zero_slot, _ = plan.zero_slot, plan.trash_slot
    nlvl_l, nlvl_u = plan.lsol_nlvl, plan.usol_nlvl

    def sweep(pool, dinv, tape: SolveTapes, X, nlvl, glen, dlen):
        dtype = X.dtype

        def level(l, X):
            lo, hi = tape.gptr[l], tape.gptr[l + 1]

            def gemm(c, X):
                offs, valid = _chunk_indices(lo, hi, c, chunk, glen)
                si = jnp.where(valid, tape.gslot[offs], zero_slot)
                src = jnp.where(valid, tape.gsrc[offs], 0)
                dst = jnp.where(valid, tape.gdst[offs], nb)  # nb = trash row
                P = jnp.einsum("cij,cjk->cik", pool[si], X[src],
                               preferred_element_type=dtype,
                               precision=MATMUL_PRECISION)
                return X.at[dst].add(-P)

            nch = (hi - lo + chunk - 1) // chunk
            X = lax.fori_loop(0, nch, gemm, X)

            dlo, dhi = tape.dptr[l], tape.dptr[l + 1]

            def diag(c, X):
                offs, valid = _chunk_indices(dlo, dhi, c, chunk, dlen)
                I = jnp.where(valid, tape.diag[offs], nb)
                Ic = jnp.minimum(I, nb - 1)
                Y = jnp.einsum("cij,cjk->cik", dinv[Ic], X[jnp.minimum(I, nb)],
                               preferred_element_type=dtype,
                               precision=MATMUL_PRECISION)
                return X.at[I].set(Y)

            nchd = (dhi - dlo + chunk - 1) // chunk
            return lax.fori_loop(0, nchd, diag, X)

        return lax.fori_loop(0, nlvl, level, X)

    @jax.jit
    def solve(pool, linv, uinv, ltape: SolveTapes, utape: SolveTapes, b):
        X = b.reshape(nb, bs, nrhs)
        X = jnp.concatenate([X, jnp.zeros((1, bs, nrhs), X.dtype)], axis=0)
        X = sweep(pool, linv, ltape, X, nlvl_l, gl_len, dl_len)
        X = sweep(pool, uinv, utape, X, nlvl_u, gu_len, du_len)
        return X[:nb].reshape(nb * bs, nrhs)

    return solve


# ---------------------------------------------------------------------------
# pool initialization
# ---------------------------------------------------------------------------


def init_pool(plan: SymbolicPlan, a_data, dtype) -> jax.Array:
    """Scatter the (permuted, scaled) matrix values into the block pool.

    ``a_data`` must be in the CSC data order of the matrix the plan was built
    from. Padding diagonal entries get 1.0 (identity on the padded tail).
    """
    vals = jnp.asarray(a_data, dtype=dtype)
    if plan.init_ones:
        vals = jnp.concatenate(
            [vals, jnp.ones((plan.init_ones,), dtype=dtype)])
    flat = jnp.zeros((plan.nslots + 2) * plan.bs * plan.bs, dtype=dtype)
    flat = flat.at[jnp.asarray(plan.init_idx)].add(vals)
    return flat.reshape(plan.pool_shape)
