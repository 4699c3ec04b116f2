"""Spike 15: in-kernel diag finalize cost breakdown on real TPU.

Measures per-diag time of the flk diagonal finalize (_lu_tile_blocked)
inside a minimal sequential pallas grid, with ablations:
  full      — blocked LU + fused base inverses + block-substitution full invs
  lu_only   — blocked LU + base inverses, skip the full-inverse assembly
  base_only — just the 4 scalar (pb,pb) Doolittle base cases
  sq        — blocked LU + full inverses via repeated squaring (I+M^(2^i))
Accuracy of `sq` is checked against numpy f64.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superlu_dist_tpu.ops.kernels import flk

BS = 128
PB = 32


def dot(a, b):
    return jnp.dot(a, b, precision="highest",
                   preferred_element_type=jnp.float32)


def lu_blocked_noinv(X, thresh, pb=PB):
    """Blocked LU, base inverses only (needed for internal TRSMs)."""
    m = X.shape[0]
    P = m // pb
    lus, Lcols, Urows, li, ui = [], [], [], [], []
    tiny = jnp.zeros((1, 1), X.dtype)
    T = X
    for p in range(P):
        lu_pp, li_pp, ui_pp, t = flk._lu_tile_inkernel(T[:pb, :pb], thresh)
        tiny = tiny + t
        lus.append(lu_pp)
        li.append(li_pp)
        ui.append(ui_pp)
        if p < P - 1:
            Lp = dot(T[pb:, :pb], ui_pp)
            Up = dot(li_pp, T[:pb, pb:])
            Lcols.append(Lp)
            Urows.append(Up)
            T = T[pb:, pb:] - dot(Lp, Up)

    def Lblk(p, q):
        off = (p - q - 1) * pb
        return Lcols[q][off:off + pb]

    strips = []
    for p in range(P):
        parts = [Lblk(p, q) for q in range(p)] + [lus[p]]
        if p < P - 1:
            parts.append(Urows[p])
        strips.append(jnp.concatenate(parts, axis=1) if len(parts) > 1
                      else parts[0])
    LU = jnp.concatenate(strips, axis=0)
    return LU, li, ui, tiny


def inv_by_squaring(LU):
    """linv, uinv of the compact LU via the product form
    (I+N)^{-1} = prod_i (I + (-N)^(2^i)), N nilpotent."""
    m = LU.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols = lax.broadcasted_iota(jnp.int32, (m, m), 1)
    zero = jnp.zeros((), LU.dtype)
    # L = I + N (N = strict lower)
    M = jnp.where(rows > cols, -LU, zero)
    P = jnp.where(rows == cols, jnp.ones((), LU.dtype), zero) + M
    levels = max(1, int(np.ceil(np.log2(m))))
    for _ in range(levels - 1):
        M = dot(M, M)
        P = P + dot(P, M)
    linv = P
    # U = (I + Nu) D with Nu = strictU @ D^{-1}: U^{-1} = D^{-1} (I+Nu)^{-1}
    d = jnp.sum(jnp.where(rows == cols, LU, zero), axis=1, keepdims=True)
    dr = jnp.transpose(d)  # (1, m) diagonal per column
    Mu = jnp.where(rows < cols, -LU / dr, zero)
    Pu = jnp.where(rows == cols, jnp.ones((), LU.dtype), zero) + Mu
    for _ in range(levels - 1):
        Mu = dot(Mu, Mu)
        Pu = Pu + dot(Pu, Mu)
    uinv = Pu / d
    return linv, uinv


def make_kern(variant, n_iter):
    def kern(x_ref, o_ref, s_ref):
        def body(i, tiny):
            X = s_ref[...]
            if variant == "base_only":
                acc = tiny
                for p in range(4):
                    _lu, _li, _ui, t = flk._lu_tile_inkernel(
                        X[p * PB:(p + 1) * PB, p * PB:(p + 1) * PB],
                        jnp.float32(0))
                    acc = acc + t[0, 0]
                s_ref[...] = X + jnp.float32(1e-9)
                return acc
            if variant == "full":
                LU, li, ui, t = flk._lu_tile_blocked(X, jnp.float32(0))
                dep = li[:1, :] + ui[:1, :]
            elif variant == "lu_only":
                LU, li, ui, t = lu_blocked_noinv(X, jnp.float32(0))
                dep = jnp.concatenate([li[0][:1, :], ui[0][:1, :],
                                       jnp.zeros((1, BS - 2 * PB),
                                                 jnp.float32)], axis=1)
            else:  # sq
                LU, _li, _ui, t = lu_blocked_noinv(X, jnp.float32(0))
                li, ui = inv_by_squaring(LU)
                dep = li[:1, :] + ui[:1, :]
            s_ref[...] = LU * jnp.float32(1e-9) + X
            o_ref[...] = dep * jnp.float32(0) + LU[:1, :]
            return tiny + t if t.ndim == 0 else tiny + t[0, 0]

        _ = lax.fori_loop(0, n_iter, body, jnp.float32(0))
        o_ref[...] = s_ref[...][:1, :]

    return kern


def run(variant, n_lo=256, n_hi=1024):
    rng = np.random.default_rng(0)
    X0 = np.asarray(rng.standard_normal((BS, BS)), np.float32) + \
        np.eye(BS, dtype=np.float32) * BS
    x = jnp.asarray(X0)

    def timed(n_iter):
        kern = make_kern(variant, n_iter)

        def go(xx):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((1, BS), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((BS, BS), jnp.float32)],
            )(xx)

        go_j = jax.jit(go)
        _ = np.asarray(go_j(x))
        best = np.inf
        for _r in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(go_j(x))
            best = min(best, time.perf_counter() - t0)
        return best

    # difference two iteration counts to cancel per-call dispatch overhead
    t = (timed(n_hi) - timed(n_lo)) / (n_hi - n_lo)
    print(f"  {variant:10s} {t*1e6:8.2f} us/diag", flush=True)


def check_sq_accuracy():
    rng = np.random.default_rng(1)
    X0 = np.asarray(rng.standard_normal((BS, BS)), np.float64) + \
        np.eye(BS) * 8.0
    import scipy.linalg as sla
    _p, L, U = sla.lu(X0)
    # build compact LU in f32 and apply squaring math in numpy f64 for check
    LU = np.tril(L, -1) + U
    M = -np.tril(LU, -1)
    P = np.eye(BS) + M
    for _ in range(6):
        M = M @ M
        P = P + P @ M
    err = np.abs(P @ L - np.eye(BS)).max()
    d = np.diag(LU)[:, None]
    Mu = -np.triu(LU, 1) / d.T
    Pu = np.eye(BS) + Mu
    for _ in range(6):
        Mu = Mu @ Mu
        Pu = Pu + Pu @ Mu
    uinv = Pu / d
    err_u = np.abs(uinv @ U - np.eye(BS)).max()
    print(f"  squaring identity err: linv {err:.2e} uinv {err_u:.2e}",
          flush=True)


def main():
    print("device:", jax.devices()[0].platform, flush=True)
    check_sq_accuracy()
    for v in ("base_only", "lu_only", "full", "sq"):
        run(v)


if __name__ == "__main__":
    main()
