"""Spike 10: fast diagonal-block factorization candidates.

Current: vmapped recursive block_lu_inv (tiny-op soup) = 79us/block.
Candidates:
  a. jax.lax.linalg.lu batched (partial pivoting) + Neumann-product
     triangular inverses (exact finite series, all MXU matmuls)
  b. same but inverses via lax.linalg.triangular_solve vs identity
Check: timing + accuracy of L@U vs P@A and of inverses.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax


def _mm(a, b):
    return jnp.matmul(a, b, precision="highest",
                      preferred_element_type=jnp.float32)


def neumann_tri_inv(LU):
    """Exact inverses of the unit-lower and upper triangles of a compact
    LU block, as products of (I + N^(2^k)) factors — nilpotent series,
    all matmuls. Returns (linv, uinv)."""
    m = LU.shape[-1]
    eye = jnp.eye(m, dtype=LU.dtype)
    steps = max(1, int(np.ceil(np.log2(m))))
    L = jnp.tril(LU, -1)
    # linv = (I + N)^{-1} with N = strict lower of L: series of -N
    P = -L
    R = eye + P
    for _ in range(steps - 1):
        P = _mm(P, P)
        R = R + _mm(R, P)
    linv = R
    d = jnp.diagonal(LU, axis1=-2, axis2=-1)
    dinv = 1.0 / d
    W = jnp.triu(LU, 1) * dinv[..., :, None]   # D^{-1} M
    P = -W
    R2 = eye + P
    for _ in range(steps - 1):
        P = _mm(P, P)
        R2 = R2 + _mm(R2, P)
    uinv = R2 * dinv[..., None, :]             # (I+W)^{-1} D^{-1}
    return linv, uinv


def diag_lu_pivoted(A):
    """Batched partial-pivoted LU + inverses with the permutation folded
    into linv (linv = Lkk^{-1} Pk)."""
    lu, piv, perm = lax.linalg.lu(A)
    linv, uinv = jax.vmap(neumann_tri_inv)(lu)
    # fold Pk into linv: linv @ Pk means permuting columns of linv by perm
    linv = jnp.take_along_axis(
        linv, perm[:, None, :].astype(jnp.int32) * 0 +
        perm[:, None, :], axis=2) if False else \
        jax.vmap(lambda li, p: li[:, jnp.argsort(p)])(linv, perm)
    return lu, linv, uinv, perm


def main():
    C = 8
    m = 128
    rng = np.random.default_rng(0)
    A = rng.standard_normal((C, m, m)).astype(np.float32)
    A += np.eye(m) * 3
    Aj = jnp.asarray(A)

    f = jax.jit(diag_lu_pivoted)
    lu, linv, uinv, perm = f(Aj)
    _ = np.asarray(lu[0, 0, :2])
    t0 = time.perf_counter()
    reps = 50
    for _i in range(reps):
        lu, linv, uinv, perm = f(Aj)
    _ = np.asarray(lu[0, 0, :2])
    dt = (time.perf_counter() - t0) / reps
    print(f"[pivoted lu+inv] batch={C}: {dt*1e3:.3f} ms "
          f"-> {dt/C*1e6:.1f} us/block")

    # accuracy: Pk^T L U == A ; linv = L^{-1} Pk so linv @ A == U
    lu_np = np.asarray(lu)
    L = np.tril(lu_np, -1) + np.eye(m)
    U = np.triu(lu_np)
    perm_np = np.asarray(perm)
    err = 0.0
    for c in range(C):
        PA = A[c][perm_np[c]]
        err = max(err, np.abs(L[c] @ U[c] - PA).max())
    print(f"  max |L@U - P@A| = {err:.2e}")
    r1 = np.abs(np.asarray(linv) @ A - U).max()
    uerr = 0.0
    for c in range(C):
        uerr = max(uerr, np.abs(np.asarray(uinv)[c] @ U[c]
                                - np.eye(m)).max())
    print(f"  max |linv@A - U| = {r1:.2e}   max |uinv@U - I| = {uerr:.2e}")

    # compare with current recursive block_lu_inv
    from superlu_dist_tpu.ops.kernels.blocklu import block_lu_inv
    g = jax.jit(jax.vmap(lambda a: block_lu_inv(a, jnp.float32(0.0))))
    out = g(Aj)
    _ = np.asarray(out[0][0, 0, :2])
    t0 = time.perf_counter()
    for _i in range(10):
        out = g(Aj)
    _ = np.asarray(out[0][0, 0, :2])
    dt0 = (time.perf_counter() - t0) / 10
    print(f"[current recursive] batch={C}: {dt0*1e3:.3f} ms "
          f"-> {dt0/C*1e6:.1f} us/block")

    # conditioning quality on a HARD block (near-singular leading minor)
    B = rng.standard_normal((1, m, m)).astype(np.float32)
    B[0, 0, 0] = 1e-7
    Bj = jnp.asarray(B)
    lu2, linv2, uinv2, perm2 = jax.jit(diag_lu_pivoted)(Bj)
    x = rng.standard_normal((m, 1)).astype(np.float32)
    b = B[0] @ x
    y = np.asarray(uinv2[0]) @ (np.asarray(linv2[0]) @ b)
    print(f"  hard-block solve rel err: pivoted "
          f"{np.abs(y - x).max()/np.abs(x).max():.2e}")
    out2 = g(Bj)
    y2 = np.asarray(out2[2][0]) @ (np.asarray(out2[1][0]) @ b)
    print(f"                            unpivoted "
          f"{np.abs(y2 - x).max()/np.abs(x).max():.2e}")


if __name__ == "__main__":
    main()
