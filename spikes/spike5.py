"""Neumann (log-depth, matmul-only) triangular inverses for in-kernel use.

L = I + strict_lower(LU):  L^-1 = prod_k (I + T^(2^k)), T = -strict_lower.
U = diag(LU) + strict_upper: U^-1 = prod_k (I + W^(2^k)) @ D^-1,
    W = -(strict_upper scaled by D^-1 rows).
All ops are matmuls + iota masks + row scaling: Mosaic-friendly, exact in
exact arithmetic (nilpotent series).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superlu_dist_tpu.ops.kernels import blocklu as _bl


def _mm(a, b):
    return jnp.matmul(a, b, precision="highest",
                      preferred_element_type=a.dtype)


def tri_invs_neumann(LU):
    """(linv, uinv) of the compact-LU block, matmul-only."""
    m = LU.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols = lax.broadcasted_iota(jnp.int32, (m, m), 1)
    eye = jnp.where(rows == cols, jnp.ones((), LU.dtype), jnp.zeros((), LU.dtype))
    d = jnp.sum(jnp.where(rows == cols, LU, 0), axis=1, keepdims=True)  # (m,1)
    rinv = 1.0 / d

    T = jnp.where(rows > cols, -LU, 0)
    linv = eye + T
    W = jnp.where(rows < cols, -(LU * rinv), 0)
    uinv = eye + W
    k = 1
    while k < m - 1:
        T = _mm(T, T)
        linv = linv + _mm(linv, T)
        W = _mm(W, W)
        uinv = uinv + _mm(uinv, W)
        k *= 2
    uinv = uinv * rinv.reshape(1, m)   # column scaling: (I-W)^-1 D^-1
    return linv, uinv


def lu_inv_masked2(A, thresh):
    """Recursive LU with Neumann inverses (Pallas-compatible)."""
    m = A.shape[0]
    if m <= 8:
        LU, t = _bl._lu_base_masked(A, thresh)
        linv, uinv = tri_invs_neumann(LU)
        return LU, linv, uinv, t
    h = m // 2
    LU11, L11i, U11i, t1 = lu_inv_masked2(A[:h, :h], thresh)
    A12 = _mm(L11i, A[:h, h:])
    A21 = _mm(A[h:, :h], U11i)
    S = A[h:, h:] - _mm(A21, A12)
    LU22, L22i, U22i, t2 = lu_inv_masked2(S, thresh)
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


def lu_inv_flat(A, thresh):
    """Non-recursive: masked right-looking LU in a fori-style unroll at
    block granularity 8, then ONE Neumann inverse at full size."""
    LU, t = _lu_blocked(A, thresh)
    linv, uinv = tri_invs_neumann(LU)
    return LU, linv, uinv, t


def _lu_blocked(A, thresh):
    m = A.shape[0]
    if m <= 8:
        return _bl._lu_base_masked(A, thresh)
    h = m // 2
    LU11, t1 = _lu_blocked(A[:h, :h], thresh)
    L11i, U11i = tri_invs_neumann(LU11)
    A12 = _mm(L11i, A[:h, h:])
    A21 = _mm(A[h:, :h], U11i)
    LU22, t2 = _lu_blocked(A[h:, h:] - _mm(A21, A12), thresh)
    return jnp.concatenate([
        jnp.concatenate([LU11, A12], axis=1),
        jnp.concatenate([A21, LU22], axis=1)], axis=0), t1 + t2


def accuracy():
    print("== accuracy vs f64 (cond ~1e4 blocks) ==")
    rng = np.random.default_rng(0)
    for m in (32, 128):
        A = rng.standard_normal((m, m))
        A += np.diag(4 + np.abs(A).sum(1)) * 0.3   # mildly dominant
        A64 = A.astype(np.float64)
        import scipy.linalg as sla
        P, L64, U64 = sla.lu(A64)
        linv64 = np.linalg.inv(np.tril(np.eye(m) + 0)) # placeholder
        # ground truth from numpy
        LUc, t = jax.jit(lambda a: _bl.block_lu_inv(a, 0.0))(
            jnp.asarray(A64))[0], None
        for name, fn in (("old", lambda a: _bl.block_lu_inv(a, 0.0, masked=True)),
                         ("neumann-rec", lambda a: lu_inv_masked2(a, 0.0)),
                         ("neumann-flat", lambda a: lu_inv_flat(a, 0.0))):
            try:
                LU, li, ui, _ = jax.jit(fn)(jnp.asarray(A, np.float32))
                LU64, li64, ui64, _ = jax.jit(fn)(jnp.asarray(A64))
                # reconstruct: L @ U should equal A
                Lm = np.tril(np.asarray(LU, np.float64), -1) + np.eye(m)
                Um = np.triu(np.asarray(LU, np.float64))
                rec = np.abs(Lm @ Um - A64).max() / np.abs(A64).max()
                ili = np.abs(np.asarray(li, np.float64) @ Lm - np.eye(m)).max()
                iui = np.abs(Um @ np.asarray(ui, np.float64) - np.eye(m)).max()
                print(f"  m={m} {name:13s}: |LU-A|={rec:.2e} "
                      f"|linv L - I|={ili:.2e} |U uinv - I|={iui:.2e}")
            except Exception as e:
                print(f"  m={m} {name}: FAILED {type(e).__name__} {str(e)[:120]}")


def in_kernel(which_fn, name):
    print(f"== in-kernel {name} ==")
    rng = np.random.default_rng(0)
    for BS, C, ND in ((32, 8, 64), (64, 4, 32), (128, 4, 16)):
        nslots = max(ND, 64)
        blocks = rng.standard_normal((nslots, BS, BS)) + 4 * np.eye(BS)
        pool = np.zeros((nslots, BS, 128), np.float32)
        pool[:, :, :BS] = blocks
        pool = jnp.asarray(pool)
        dsl = rng.choice(nslots, ND, replace=False).astype(np.int32)

        def kern(dsl_ref, pool_ref, out_ref, li_ref, ui_ref, sD, sL, sU,
                 semD, semW):
            g = jnp.asarray(pl.program_id(0), jnp.int32)
            base = g * jnp.int32(C)
            for j in range(C):
                pltpu.make_async_copy(pool_ref.at[dsl_ref[base + j]],
                                      sD.at[jnp.int32(j)],
                                      semD.at[jnp.int32(j)]).start()
            for j in range(C):
                pltpu.make_async_copy(pool_ref.at[dsl_ref[base + j]],
                                      sD.at[jnp.int32(j)],
                                      semD.at[jnp.int32(j)]).wait()
            D = sD[...][:, :, :BS]
            LU, li, ui, nt = jax.vmap(which_fn, in_axes=(0, None))(D, 1e-10)
            if BS < 128:
                z = jnp.zeros((C, BS, 128 - BS), jnp.float32)
                LU = jnp.concatenate([LU, z], axis=2)
                li = jnp.concatenate([li, z], axis=2)
                ui = jnp.concatenate([ui, z], axis=2)
            sD[...] = LU
            sL[...] = li
            sU[...] = ui
            for j in range(C):
                pltpu.make_async_copy(sD.at[jnp.int32(j)],
                                      out_ref.at[dsl_ref[base + j]],
                                      semW.at[jnp.int32(j)]).start()
                pltpu.make_async_copy(sL.at[jnp.int32(j)],
                                      li_ref.at[dsl_ref[base + j]],
                                      semW.at[jnp.int32(j)]).start()
                pltpu.make_async_copy(sU.at[jnp.int32(j)],
                                      ui_ref.at[dsl_ref[base + j]],
                                      semW.at[jnp.int32(j)]).start()
            for j in range(C):
                pltpu.make_async_copy(sD.at[jnp.int32(j)],
                                      out_ref.at[dsl_ref[base + j]],
                                      semW.at[jnp.int32(j)]).wait()
                pltpu.make_async_copy(sL.at[jnp.int32(j)],
                                      li_ref.at[dsl_ref[base + j]],
                                      semW.at[jnp.int32(j)]).wait()
                pltpu.make_async_copy(sU.at[jnp.int32(j)],
                                      ui_ref.at[dsl_ref[base + j]],
                                      semW.at[jnp.int32(j)]).wait()

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ND // C,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            scratch_shapes=[pltpu.VMEM((C, BS, 128), jnp.float32)] * 3
            + [pltpu.SemaphoreType.DMA((C,))] * 2,
        )

        @jax.jit
        def call(pool, dsl):
            return pl.pallas_call(
                kern,
                out_shape=[jax.ShapeDtypeStruct(pool.shape, pool.dtype)] * 3,
                grid_spec=grid_spec,
                input_output_aliases={1: 0},
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(dsl, pool)

        try:
            t0 = time.time()
            out = call(pool, jnp.asarray(dsl))
            out[0].block_until_ready()
            ct = time.time() - t0
            t0 = time.perf_counter()
            for _ in range(20):
                out = call(pool, jnp.asarray(dsl))
            out[0].block_until_ready()
            dt = (time.perf_counter() - t0) / 20
            ref = jax.jit(jax.vmap(
                lambda a, t: which_fn(a, t), in_axes=(0, None)))(
                pool[dsl][:, :, :BS], 1e-10)
            err = float(jnp.abs(out[0][dsl][:, :, :BS] - ref[0]).max())
            erri = float(jnp.abs(out[1][dsl][:, :, :BS] - ref[1]).max())
            print(f"  bs={BS:4d} x{ND}: {dt*1e3:8.3f} ms "
                  f"({dt/ND*1e6:6.2f} us/diag)  vs-XLA err={err:.2e}/"
                  f"{erri:.2e}  compile={ct:.0f}s")
        except Exception as e:
            print(f"  bs={BS}: FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "a"
    print("device:", jax.devices()[0].device_kind)
    if "a" in which:
        accuracy()
    if "k" in which:
        in_kernel(lu_inv_masked2, "neumann-rec")
    if "f" in which:
        in_kernel(lu_inv_flat, "neumann-flat")
