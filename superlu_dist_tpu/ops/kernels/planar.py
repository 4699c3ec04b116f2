"""Planar-complex block LU executors: complex as (re, im) planes.

The TPU backend has no complex arithmetic at all (any complex array op
fails with UNIMPLEMENTED), so the z/c precisions of the reference
(reference: SRC/complex16/pzgssvx.c, zSRC kernels) are recast as *planar*
real arithmetic: every complex block A is stored as a (2, B, B) pair of
real planes, a complex GEMM is one stacked einsum

    E[p, q] = A[p] @ B[q]   →   re = E[0,0] − E[1,1],  im = E[0,1] + E[1,0]

(4 real MXU GEMMs fused in a single batched contraction), and complex
scalar ops (pivot division, |z| for ReplaceTinyPivot) are explicit
re/im formulas. The instruction tapes are identical to the real
executor's — only the pool layout gains the plane axis:

    pool: (poolp, 2, bs, bs)    linv/uinv: (nbp+1, 2, bs, bs)
    X:    (nbp+1, 2, bs, nrhs)

Triangular inverses use the log-Neumann form (matmul-only, exact for
triangular factors): L = I + S with S strictly lower nilpotent gives
L^-1 = prod_k (I + T^(2^k)), T = -S — the same formulation the Pallas
in-kernel diagonal op uses, so all executors share one algebra.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..host.symbolic import SymbolicPlan
from . import blocklu as _bl
from .blocklu import (Buckets, FactorTapes, SolveTapes, MATMUL_PRECISION,
                      bucket125, factor_buckets, solve_buckets,
                      trans_solve_buckets, _chunk_indices)

__all__ = [
    "init_pool_planar", "build_factor_fn_planar", "build_solve_fn_planar",
    "build_trans_solve_fn_planar", "planar_to_complex", "complex_to_planar",
    "block_lu_inv_planar",
]


def _real_base(dtype):
    d = np.dtype(dtype)
    if d.kind == "c":
        return np.dtype(np.float32) if d.itemsize == 8 \
            else np.dtype(np.float64)
    return d


def complex_to_planar(x) -> jnp.ndarray:
    """(..., ) complex → (..., 2) real planes stacked on a NEW leading
    axis at position -3 for blocks / -2 for vectors is awkward; we use
    axis 0 of a fresh dimension: returns (2, ...) real."""
    x = np.asarray(x)
    return jnp.asarray(np.stack([x.real, x.imag], axis=0).astype(
        _real_base(x.dtype)))


def planar_to_complex(x) -> np.ndarray:
    """(2, ...) or (..., 2, m, n) with plane axis given explicitly by the
    caller using axis 0 — here we only handle the (2, ...) convention."""
    x = np.asarray(x)
    cdt = np.complex64 if x.dtype == np.float32 else np.complex128
    return (x[0] + 1j * x[1]).astype(cdt)


# ---------------------------------------------------------------------------
# planar complex algebra on (2, m, n) arrays
# ---------------------------------------------------------------------------


def _pmm(a, b):
    """Complex matmul of planar blocks: a, b are (2, m, k), (2, k, n)."""
    e = jnp.einsum("pij,qjk->pqik", a, b, precision=MATMUL_PRECISION,
                   preferred_element_type=a.dtype)
    return jnp.stack([e[0, 0] - e[1, 1], e[0, 1] + e[1, 0]])


def _pneg(a):
    return -a


def _tri_invs_neumann_planar(LU):
    """(linv, uinv) of a planar compact-LU block (2, m, m), matmul-only."""
    m = LU.shape[-1]
    rows = lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols = lax.broadcasted_iota(jnp.int32, (m, m), 1)
    eye = jnp.where(rows == cols, jnp.ones((), LU.dtype),
                    jnp.zeros((), LU.dtype))
    peye = jnp.stack([eye, jnp.zeros_like(eye)])
    # diagonal as (2, m, 1); complex reciprocal conj(d)/|d|^2
    d = jnp.sum(jnp.where(rows == cols, LU, 0), axis=-1, keepdims=True)
    dmag = d[0] * d[0] + d[1] * d[1]
    rinv = jnp.stack([d[0] / dmag, -d[1] / dmag])   # (2, m, 1)

    T = jnp.where(rows > cols, -LU, 0)
    linv = peye + T
    # W = -(D^-1 · strict_upper): row-scale by complex reciprocal
    su = jnp.where(rows < cols, LU, 0)
    W = -jnp.stack([rinv[0] * su[0] - rinv[1] * su[1],
                    rinv[0] * su[1] + rinv[1] * su[0]])
    uinv = peye + W
    k = 1
    while k < m - 1:
        T = _pmm(T, T)
        linv = linv + _pmm(linv, T)
        W = _pmm(W, W)
        uinv = uinv + _pmm(uinv, W)
        k *= 2
    # column scaling: (I - W)^-1 D^-1
    rc = rinv.reshape(2, 1, m)
    uinv = jnp.stack([uinv[0] * rc[0] - uinv[1] * rc[1],
                      uinv[0] * rc[1] + uinv[1] * rc[0]])
    return linv, uinv


def _lu_base_planar(A, thresh):
    """Unrolled right-looking complex LU of a small planar (2, m, m) block,
    no pivoting, GESP tiny-pivot substitution on |z| with the pivot's
    phase (reference: pdgstrf2.c ReplaceTinyPivot, complex16 variant)."""
    m = A.shape[-1]
    tinyf = jnp.finfo(A.dtype).tiny
    tiny = jnp.zeros((), jnp.int32)
    for j in range(m):
        pr, pi = A[0, j, j], A[1, j, j]
        apiv = jnp.sqrt(pr * pr + pi * pi)
        bad = apiv < thresh
        den = jnp.maximum(apiv, tinyf)
        ur = jnp.where(apiv > 0, pr / den, jnp.ones_like(pr))
        ui = jnp.where(apiv > 0, pi / den, jnp.zeros_like(pi))
        pr = jnp.where(bad, ur * thresh, pr)
        pi = jnp.where(bad, ui * thresh, pi)
        tiny = tiny + bad.astype(jnp.int32)
        A = A.at[0, j, j].set(pr).at[1, j, j].set(pi)
        if j + 1 < m:
            pmag = pr * pr + pi * pi
            cr = (A[0, j + 1:, j] * pr + A[1, j + 1:, j] * pi) / pmag
            ci = (A[1, j + 1:, j] * pr - A[0, j + 1:, j] * pi) / pmag
            A = A.at[0, j + 1:, j].set(cr).at[1, j + 1:, j].set(ci)
            rr, ri = A[0, j, j + 1:], A[1, j, j + 1:]
            A = A.at[0, j + 1:, j + 1:].add(
                -(cr[:, None] * rr[None, :] - ci[:, None] * ri[None, :]))
            A = A.at[1, j + 1:, j + 1:].add(
                -(cr[:, None] * ri[None, :] + ci[:, None] * rr[None, :]))
    return A, tiny


def block_lu_inv_planar(A, thresh):
    """Recursive blocked complex LU with triangular inverses on planar
    blocks (2, m, m) — the planar twin of blocklu.block_lu_inv."""
    m = A.shape[-1]
    if m <= 8:
        LU, t = _lu_base_planar(A, thresh)
        linv, uinv = _tri_invs_neumann_planar(LU)
        return LU, linv, uinv, t
    h = m // 2
    LU11, L11i, U11i, t1 = block_lu_inv_planar(A[:, :h, :h], thresh)
    A12 = _pmm(L11i, A[:, :h, h:])
    A21 = _pmm(A[:, h:, :h], U11i)
    S = A[:, h:, h:] - _pmm(A21, A12)
    LU22, L22i, U22i, t2 = block_lu_inv_planar(S, thresh)
    z = jnp.zeros((2, h, m - h), dtype=A.dtype)
    LU = jnp.concatenate([
        jnp.concatenate([LU11, A12], axis=2),
        jnp.concatenate([A21, LU22], axis=2)], axis=1)
    linv = jnp.concatenate([
        jnp.concatenate([L11i, z], axis=2),
        jnp.concatenate([-_pmm(L22i, _pmm(A21, L11i)), L22i], axis=2)],
        axis=1)
    uinv = jnp.concatenate([
        jnp.concatenate([U11i, -_pmm(U11i, _pmm(A12, U22i))], axis=2),
        jnp.concatenate([jnp.swapaxes(z, 1, 2), U22i], axis=2)], axis=1)
    return LU, linv, uinv, t1 + t2


# ---------------------------------------------------------------------------
# batched planar gemms over tape chunks
# ---------------------------------------------------------------------------


def _bmm(a, b, transpose=False):
    """Batched planar complex matmul: a, b are (c, 2, bs, *)."""
    spec = "cpji,cqjk->cpqik" if transpose else "cpij,cqjk->cpqik"
    e = jnp.einsum(spec, a, b, precision=MATMUL_PRECISION,
                   preferred_element_type=a.dtype)
    return jnp.stack([e[:, 0, 0] - e[:, 1, 1], e[:, 0, 1] + e[:, 1, 0]],
                     axis=1)


# ---------------------------------------------------------------------------
# factorization executor
# ---------------------------------------------------------------------------


def _factor_core_planar(b: Buckets, chunk: int, diag_chunk: int):
    bs, nbp = b.bs, b.nbp
    blu = jax.vmap(block_lu_inv_planar, in_axes=(0, None))

    def factor(pool, thresh, tapes: FactorTapes):
        dtype = pool.dtype
        zs = tapes.consts[0]
        ts = tapes.consts[1]
        linv0 = jnp.zeros((nbp + 1, 2, bs, bs), dtype)
        uinv0 = jnp.zeros((nbp + 1, 2, bs, bs), dtype)

        def level(l, carry):
            pool, linv, uinv, tiny = carry

            lo, hi = tapes.dptr[l], tapes.dptr[l + 1]

            def diag(c, carry):
                pool, linv, uinv, tiny = carry
                offs, valid = _chunk_indices(lo, hi, c, diag_chunk, b.dlen)
                steps = jnp.where(valid, tapes.dstep[offs], nbp)
                dsl = tapes.dslot[steps]
                LU, lk, uk, nt = blu(pool[dsl], thresh)
                pool = pool.at[jnp.where(valid, dsl, ts)].set(LU)
                linv = linv.at[steps].set(lk)
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
                return pool.at[si].set(_bmm(pool[si], uinv[st]))

            nch = (lhi - llo + chunk - 1) // chunk
            pool = lax.fori_loop(0, nch, ltrsm, pool)

            ulo, uhi = tapes.uptr[l], tapes.uptr[l + 1]

            def utrsm(c, pool):
                offs, valid = _chunk_indices(ulo, uhi, c, chunk, b.ulen)
                si = jnp.where(valid, tapes.u_slot[offs], ts)
                st = jnp.where(valid, tapes.u_step[offs], nbp)
                return pool.at[si].set(_bmm(linv[st], pool[si]))

            nch = (uhi - ulo + chunk - 1) // chunk
            pool = lax.fori_loop(0, nch, utrsm, pool)

            glo, ghi = tapes.gptr[l], tapes.gptr[l + 1]

            def gemm(c, pool):
                offs, valid = _chunk_indices(glo, ghi, c, chunk, b.glen)
                li = jnp.where(valid, tapes.g_l[offs], zs)
                ui = jnp.where(valid, tapes.g_u[offs], zs)
                ti = jnp.where(valid, tapes.g_t[offs], ts)
                return pool.at[ti].add(-_bmm(pool[li], pool[ui]))

            nch = (ghi - glo + chunk - 1) // chunk
            pool = lax.fori_loop(0, nch, gemm, pool)

            return pool, linv, uinv, tiny

        return lax.fori_loop(
            0, b.nlvlp, level,
            (pool, linv0, uinv0, jnp.zeros((), jnp.int32)))

    return factor


@functools.lru_cache(maxsize=64)
def _factor_executor_planar(b: Buckets, chunk: int, diag_chunk: int):
    return jax.jit(_factor_core_planar(b, chunk, diag_chunk),
                   donate_argnums=(0,))


def build_factor_fn_planar(plan: SymbolicPlan, *, chunk: int = 32,
                           diag_chunk: int = 8):
    """factor(pool, thresh, tapes) on a planar pool (poolp, 2, bs, bs).
    thresh is the real |z| threshold."""
    return _factor_executor_planar(factor_buckets(plan), chunk, diag_chunk)


def build_factor_core_planar(plan: SymbolicPlan, *, chunk: int = 32,
                             diag_chunk: int = 8):
    return _factor_core_planar(factor_buckets(plan), chunk, diag_chunk)


# ---------------------------------------------------------------------------
# triangular solves
# ---------------------------------------------------------------------------


def _solve_core_planar(bs, nbp, gl_len, gu_len, dl_len, du_len, nlvl_l,
                       nlvl_u, nrhs, chunk, transpose=False):

    def sweep(pool, dinv, tape: SolveTapes, X, nlvl, glen, dlen, zs):
        def level(l, X):
            lo, hi = tape.gptr[l], tape.gptr[l + 1]

            def gemm(c, X):
                offs, valid = _chunk_indices(lo, hi, c, chunk, glen)
                si = jnp.where(valid, tape.gslot[offs], zs)
                src = jnp.where(valid, tape.gsrc[offs], 0)
                dst = jnp.where(valid, tape.gdst[offs], nbp)
                P = _bmm(pool[si], X[src], transpose=transpose)
                return X.at[dst].add(-P)

            nch = (hi - lo + chunk - 1) // chunk
            X = lax.fori_loop(0, nch, gemm, X)

            dlo, dhi = tape.dptr[l], tape.dptr[l + 1]

            def diag(c, X):
                offs, valid = _chunk_indices(dlo, dhi, c, chunk, dlen)
                I = jnp.where(valid, tape.diag[offs], nbp)
                Ic = jnp.minimum(I, nbp - 1)
                Y = _bmm(dinv[Ic], X[I], transpose=transpose)
                return X.at[I].set(Y)

            nchd = (dhi - dlo + chunk - 1) // chunk
            return lax.fori_loop(0, nchd, diag, X)

        return lax.fori_loop(0, nlvl, level, X)

    def solve(pool, linv, uinv, ltape: SolveTapes, utape: SolveTapes, b):
        # b: (2, nbp*bs, nrhs) planar
        X = jnp.moveaxis(b.reshape(2, nbp, bs, nrhs), 0, 1)
        X = jnp.concatenate([X, jnp.zeros((1, 2, bs, nrhs), X.dtype)],
                            axis=0)
        X = sweep(pool, linv, ltape, X, nlvl_l, gl_len, dl_len,
                  ltape.consts[0])
        X = sweep(pool, uinv, utape, X, nlvl_u, gu_len, du_len,
                  utape.consts[0])
        return jnp.moveaxis(X[:nbp], 1, 0).reshape(2, nbp * bs, nrhs)

    return solve


@functools.lru_cache(maxsize=64)
def _solve_executor_planar(key, nrhs, chunk, transpose=False):
    return jax.jit(_solve_core_planar(*key, nrhs, chunk,
                                      transpose=transpose))


def build_solve_fn_planar(plan: SymbolicPlan, nrhs: int, *, chunk: int = 32):
    """Planar LU solve: b is (2, nbp·bs, nrhs) real planes."""
    return _solve_executor_planar(solve_buckets(plan), nrhs, chunk)


def build_solve_core_planar(plan: SymbolicPlan, nrhs: int, *,
                            chunk: int = 32):
    return _solve_core_planar(*solve_buckets(plan), nrhs, chunk)


def build_trans_solve_fn_planar(plan: SymbolicPlan, nrhs: int, *,
                                chunk: int = 32):
    """Aᵀx = b planar executor (conjugation handled by the caller)."""
    return _solve_executor_planar(trans_solve_buckets(plan), nrhs, chunk,
                                  transpose=True)


# ---------------------------------------------------------------------------
# pool initialization
# ---------------------------------------------------------------------------


def init_pool_planar(plan: SymbolicPlan, a_data, dtype) -> jax.Array:
    """Planar pool (poolp, 2, bs, bs) from complex CSC data."""
    b = factor_buckets(plan)
    rdt = _real_base(dtype)
    a = np.asarray(a_data)
    vr = np.asarray(a.real, dtype=rdt)
    vi = np.asarray(a.imag, dtype=rdt)
    if plan.init_ones:
        vr = np.concatenate([vr, np.ones((plan.init_ones,), dtype=rdt)])
        vi = np.concatenate([vi, np.zeros((plan.init_ones,), dtype=rdt)])
    bb = plan.bs * plan.bs
    idx = np.asarray(plan.init_idx)
    # flat layout (poolp, 2, bs, bs): slot s, plane p, offset o
    #   flat = s*2*bb + p*bb + o  where init_idx = s*bb + o
    # Host numpy scatter + one device_put: an on-device scatter costs an
    # XLA compile per shape signature (~5s each through the TPU tunnel).
    slot = idx // bb
    off = idx % bb
    flat = np.zeros(b.poolp * 2 * bb, dtype=rdt)
    np.add.at(flat, slot * (2 * bb) + off, vr)
    np.add.at(flat, slot * (2 * bb) + bb + off, vi)
    return jax.device_put(flat.reshape(b.poolp, 2, plan.bs, plan.bs))
