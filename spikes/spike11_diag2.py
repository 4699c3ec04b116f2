"""Spike 11: diag candidates, measured inside a fori_loop (amortized).

Candidates for (LU, linv, uinv) of a batch of 128x128 blocks:
  a. current recursive block_lu_inv (leaf-sequential tiny ops)
  b. lax.linalg.lu (partial pivot) + batched-leaf recursive tri inversion
  c. lax.linalg.lu + lax.linalg.triangular_solve vs I for inverses
Accuracy checked against f64 numpy.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

LEAF = 8


def _mm(a, b):
    return jnp.matmul(a, b, precision="highest",
                      preferred_element_type=jnp.float32)


def _leaf_linv(L):
    """Batched unit-lower-triangular inverse by substitution; L: (..., m, m)
    with m = LEAF. Unrolled rows, all leaves in one batch."""
    m = L.shape[-1]
    eye = jnp.eye(m, dtype=L.dtype)
    rows = [jnp.broadcast_to(eye[0], L.shape[:-2] + (m,))]
    for i in range(1, m):
        acc = jnp.broadcast_to(eye[i], L.shape[:-2] + (m,))
        for j in range(i):
            acc = acc - L[..., i, j][..., None] * rows[j]
        rows.append(acc)
    return jnp.stack(rows, axis=-2)


def _leaf_uinv(U):
    m = U.shape[-1]
    eye = jnp.eye(m, dtype=U.dtype)
    rows = [None] * m
    rows[m - 1] = eye[m - 1] / U[..., m - 1, m - 1][..., None]
    for i in range(m - 2, -1, -1):
        acc = jnp.broadcast_to(eye[i], U.shape[:-2] + (m,))
        for j in range(i + 1, m):
            acc = acc - U[..., i, j][..., None] * rows[j]
        rows[i] = acc / U[..., i, i][..., None]
    return jnp.stack(rows, axis=-2)


def tri_invs_batched(LU):
    """(linv, uinv) of compact LU (..., m, m): batched leaves + matmul
    merges. All leaves across batch AND diagonal positions go through the
    substitution in one shot."""
    m = LU.shape[-1]
    nl = m // LEAF
    # extract all diagonal leaf blocks: (..., nl, LEAF, LEAF)
    lead = LU.shape[:-2]
    blocks = LU.reshape(lead + (nl, LEAF, nl, LEAF))
    diag = jnp.einsum("...ikil->...ikl" if False else "...",
                      blocks) if False else None
    idx = jnp.arange(nl)
    dleaf = blocks[..., idx, :, idx, :]        # (nl, ..., LEAF, LEAF)?
    # NB: advanced indexing pulls nl to front when ... present; normalize:
    if dleaf.shape[0] == nl and lead:
        dleaf = jnp.moveaxis(dleaf, 0, len(lead))   # (..., nl, LEAF, LEAF)
    Ld = jnp.tril(dleaf, -1) + jnp.eye(LEAF, dtype=LU.dtype)
    Ud = jnp.triu(dleaf)
    li = _leaf_linv(Ld)                        # (..., nl, LEAF, LEAF)
    ui = _leaf_uinv(Ud)

    # place leaf inverses on the diagonal of full-size carriers
    def scatter_diag(inv):
        out = jnp.zeros(lead + (nl, LEAF, nl, LEAF), LU.dtype)
        out = out.at[..., idx, :, idx, :].set(
            jnp.moveaxis(inv, len(lead), 0) if lead else inv)
        return out.reshape(lead + (m, m))

    linv = scatter_diag(li)
    uinv = scatter_diag(ui)
    L = jnp.tril(LU, -1) + jnp.eye(m, dtype=LU.dtype)
    U = jnp.triu(LU)
    # merge upward: sizes LEAF -> m
    s = LEAF
    while s < m:
        s2 = 2 * s
        k = m // s2
        # views as (..., k, s2, k, s2) diagonal blocks
        Lv = L.reshape(lead + (k, s2, k, s2))
        kidx = jnp.arange(k)
        Ldiag = Lv[..., kidx, :, kidx, :]
        if lead:
            Ldiag = jnp.moveaxis(Ldiag, 0, len(lead))
        L21 = Ldiag[..., s:, :s]
        liv = linv.reshape(lead + (k, s2, k, s2))
        lid = liv[..., kidx, :, kidx, :]
        if lead:
            lid = jnp.moveaxis(lid, 0, len(lead))
        A = lid[..., :s, :s]
        Bv = lid[..., s:, s:]
        off_l = -_mm(Bv, _mm(L21, A))
        lid = lid.at[..., s:, :s].set(off_l)
        linv = jnp.zeros_like(liv).at[..., kidx, :, kidx, :].set(
            jnp.moveaxis(lid, len(lead), 0) if lead else lid
        ).reshape(lead + (m, m))

        Uv = U.reshape(lead + (k, s2, k, s2))
        Udiag = Uv[..., kidx, :, kidx, :]
        if lead:
            Udiag = jnp.moveaxis(Udiag, 0, len(lead))
        U12 = Udiag[..., :s, s:]
        uiv = uinv.reshape(lead + (k, s2, k, s2))
        uid = uiv[..., kidx, :, kidx, :]
        if lead:
            uid = jnp.moveaxis(uid, 0, len(lead))
        Au = uid[..., :s, :s]
        Bu = uid[..., s:, s:]
        off_u = -_mm(Au, _mm(U12, Bu))
        uid = uid.at[..., :s, s:].set(off_u)
        uinv = jnp.zeros_like(uiv).at[..., kidx, :, kidx, :].set(
            jnp.moveaxis(uid, len(lead), 0) if lead else uid
        ).reshape(lead + (m, m))
        s = s2
    return linv, uinv


def cand_a(A):
    from superlu_dist_tpu.ops.kernels.blocklu import block_lu_inv
    LU, li, ui, t = jax.vmap(lambda a: block_lu_inv(a, jnp.float32(0.0)))(A)
    return LU, li, ui


def cand_b(A):
    lu, piv, perm = lax.linalg.lu(A)
    li, ui = tri_invs_batched(lu)
    li = jax.vmap(lambda l, p: l[:, jnp.argsort(p)])(li, perm)
    return lu, li, ui


def cand_c(A):
    lu, piv, perm = lax.linalg.lu(A)
    eye = jnp.broadcast_to(jnp.eye(128, dtype=A.dtype), A.shape)
    li = lax.linalg.triangular_solve(lu, eye, left_side=True, lower=True,
                                     unit_diagonal=True)
    ui = lax.linalg.triangular_solve(lu, eye, left_side=True, lower=False)
    li = jax.vmap(lambda l, p: l[:, jnp.argsort(p)])(li, perm)
    return lu, li, ui


def run(name, f, A, reps=16):
    def loop(A):
        def body(i, acc):
            lu, li, ui = f(A + acc * 0)
            return acc + lu[0, 0, 0] + li[0, 0, 0] + ui[0, 0, 0]
        return lax.fori_loop(0, 32, body, jnp.float32(0))

    g = jax.jit(loop)
    _ = np.asarray(g(A))
    t0 = time.perf_counter()
    for _i in range(reps):
        out = g(A)
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / reps / 32
    C = A.shape[0]
    print(f"[{name}] batch={C}: {dt*1e3:.3f} ms/batch "
          f"-> {dt/C*1e6:.1f} us/block")


def accuracy(f, A, pivoted):
    lu, li, ui = jax.jit(f)(A)
    lu, li, ui = map(np.asarray, (lu, li, ui))
    A64 = np.asarray(A, np.float64)
    errs = []
    for c in range(A.shape[0]):
        # linv (optionally with perm folded) should satisfy ui @ (li @ A) = I
        X = ui[c].astype(np.float64) @ (li[c].astype(np.float64) @ A64[c])
        errs.append(np.abs(X - np.eye(128)).max())
    print(f"   max |uinv@linv@A - I| = {max(errs):.2e}")


def main():
    C = 8
    rng = np.random.default_rng(0)
    A = rng.standard_normal((C, 128, 128)).astype(np.float32)
    A += np.eye(128) * 3
    Aj = jnp.asarray(A)
    for name, f in (("a: current", cand_a), ("b: lu+batched-leaf", cand_b),
                    ("c: lu+trisolve", cand_c)):
        run(name, f, Aj)
        accuracy(f, Aj, name != "a")


if __name__ == "__main__":
    main()
