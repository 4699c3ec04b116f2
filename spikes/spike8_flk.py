"""Spike 8: microbenchmarks for the fused left-looking factor kernel (flk).

Questions (measured on the real TPU):
  1. per-DMA-issue cost: N sequential (bs,bs) HBM->VMEM copies in one kernel
  2. concatenated dot (bs, K*bs)@(K*bs, bs) vs K separate (bs,bs) dots
  3. small-block DMA: does bs=32/64 work, and per-block cost
  4. per-grid-step overhead of a sequential TPU grid
  5. in-kernel masked block_lu_inv at bs=128: compile time + correctness
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


# --------------------------------------------------------------- 1+3: DMA
def make_dma_chain(nwin, C, bs):
    def kern(idx_ref, pool_ref, out_ref, sX, acc_ref, sem, semw):
        g = pl.program_id(0)
        base = g * jnp.int32(C)
        for j in range(C):
            pltpu.make_async_copy(pool_ref.at[idx_ref[base + j]],
                                  sX.at[jnp.int32(j)],
                                  sem.at[jnp.int32(j)]).start()
        for j in range(C):
            pltpu.make_async_copy(pool_ref.at[idx_ref[base + j]],
                                  sX.at[jnp.int32(j)],
                                  sem.at[jnp.int32(j)]).wait()
        acc = sX[jnp.int32(0)]
        for j in range(1, C):
            acc = acc + sX[jnp.int32(j)]
        acc_ref[...] = acc

        @pl.when(g == nwin - 1)
        def _():
            pltpu.make_async_copy(acc_ref, out_ref, semw).start()
            pltpu.make_async_copy(acc_ref, out_ref, semw).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nwin,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((C, bs, bs), jnp.float32),
                        pltpu.VMEM((bs, bs), jnp.float32),
                        pltpu.SemaphoreType.DMA((C,)),
                        pltpu.SemaphoreType.DMA(())],
    )

    @jax.jit
    def call(pool, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((bs, bs), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, pool)

    return call


def bench_dma(bs, nslots=2048, nwin=512, C=16):
    pool = jnp.asarray(np.random.randn(nslots, bs, bs).astype(np.float32))
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, nslots, nwin * C).astype(np.int32))
    call = make_dma_chain(nwin, C, bs)
    dt, _ = timed(call, pool, idx)
    n = nwin * C
    print(f"[dma bs={bs}] {n} copies of {bs*bs*4}B: {dt*1e3:.3f} ms "
          f"-> {dt/n*1e9:.0f} ns/copy, {n*bs*bs*4/dt/1e9:.1f} GB/s")


# --------------------------------------------------------------- 2: dots
def make_dot_bench(nwin, K, bs, concat):
    def kern(pool_ref, out_ref, sA, sB, sX, semA, semB, semw):
        g = pl.program_id(0)
        pltpu.make_async_copy(pool_ref.at[pl.ds(0, K)], sA, semA).start()
        pltpu.make_async_copy(pool_ref.at[pl.ds(K, K)], sB, semB).start()
        pltpu.make_async_copy(pool_ref.at[pl.ds(0, K)], sA, semA).wait()
        pltpu.make_async_copy(pool_ref.at[pl.ds(K, K)], sB, semB).wait()
        if concat:
            A = sA[...].transpose(1, 0, 2).reshape(bs, K * bs)
            B = sB[...].reshape(K * bs, bs)
            acc = jnp.dot(A, B, precision="highest",
                          preferred_element_type=jnp.float32)
        else:
            acc = jnp.zeros((bs, bs), jnp.float32)
            for k in range(K):
                acc = acc + jnp.dot(sA[k], sB[k], precision="highest",
                                    preferred_element_type=jnp.float32)
        sX[...] = acc

        @pl.when(g == nwin - 1)
        def _():
            pltpu.make_async_copy(sX, out_ref, semw).start()
            pltpu.make_async_copy(sX, out_ref, semw).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nwin,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((K, bs, bs), jnp.float32),
                        pltpu.VMEM((K, bs, bs), jnp.float32),
                        pltpu.VMEM((bs, bs), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
    )

    @jax.jit
    def call(pool):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((bs, bs), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(pool)

    return call


def bench_dots(bs=128, K=8, nwin=512):
    pool = jnp.asarray(np.random.randn(2 * K, bs, bs).astype(np.float32))
    for concat in (False, True):
        call = make_dot_bench(nwin, K, bs, concat)
        dt, _ = timed(call, pool)
        fl = nwin * K * 2 * bs ** 3
        print(f"[dot bs={bs} K={K} concat={concat}] {dt*1e3:.3f} ms "
              f"-> {dt/nwin*1e6:.2f} us/win, {fl/dt/1e12:.2f} TF/s")


# --------------------------------------------------------------- 4: grid
def make_empty_grid(nwin):
    def kern(x_ref, o_ref, sX, semw):
        g = pl.program_id(0)

        @pl.when(g == nwin - 1)
        def _():
            pltpu.make_async_copy(x_ref, sX, semw).start()
            pltpu.make_async_copy(x_ref, sX, semw).wait()
            pltpu.make_async_copy(sX, o_ref, semw).start()
            pltpu.make_async_copy(sX, o_ref, semw).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(nwin,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )

    @jax.jit
    def call(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)

    return call


def bench_grid(nwin=4096):
    x = jnp.zeros((8, 128), jnp.float32)
    call = make_empty_grid(nwin)
    dt, _ = timed(call, x)
    print(f"[grid] {nwin} empty steps: {dt*1e3:.3f} ms "
          f"-> {dt/nwin*1e9:.0f} ns/step")


# --------------------------------------------------------------- 5: in-kernel LU
def make_lu_kernel(bs, nb):
    from superlu_dist_tpu.ops.kernels.blocklu import block_lu_inv

    def kern(pool_ref, out_ref, linv_ref, uinv_ref, sX, sL, sU, sem):
        g = pl.program_id(0)
        pltpu.make_async_copy(pool_ref.at[g], sX, sem).start()
        pltpu.make_async_copy(pool_ref.at[g], sX, sem).wait()
        LU, li, ui, _t = block_lu_inv(sX[...], jnp.float32(0.0), masked=True)
        sX[...] = LU
        sL[...] = li
        sU[...] = ui
        pltpu.make_async_copy(sX, out_ref.at[g], sem).start()
        pltpu.make_async_copy(sX, out_ref.at[g], sem).wait()
        pltpu.make_async_copy(sL, linv_ref.at[g], sem).start()
        pltpu.make_async_copy(sL, linv_ref.at[g], sem).wait()
        pltpu.make_async_copy(sU, uinv_ref.at[g], sem).start()
        pltpu.make_async_copy(sU, uinv_ref.at[g], sem).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        scratch_shapes=[pltpu.VMEM((bs, bs), jnp.float32)] * 3
        + [pltpu.SemaphoreType.DMA(())],
    )

    @jax.jit
    def call(pool):
        return pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct((nb, bs, bs), jnp.float32)] * 3,
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(pool)

    return call


def bench_lu(bs=128, nb=64):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((nb, bs, bs)).astype(np.float32)
    A += np.eye(bs) * bs  # well-conditioned
    pool = jnp.asarray(A)
    call = make_lu_kernel(bs, nb)
    t0 = time.perf_counter()
    LU, li, ui = call(pool)
    jax.block_until_ready(LU)
    t_compile = time.perf_counter() - t0
    dt, _ = timed(call, pool, reps=10)
    # correctness vs XLA
    from superlu_dist_tpu.ops.kernels.blocklu import block_lu_inv
    LU0, li0, ui0, _ = jax.jit(jax.vmap(
        lambda a: block_lu_inv(a, jnp.float32(0.0))))(pool)
    err = float(jnp.max(jnp.abs(LU - LU0)))
    ierr = float(jnp.max(jnp.abs(li - li0))) + float(jnp.max(jnp.abs(ui - ui0)))
    print(f"[lu bs={bs}] compile {t_compile:.1f}s  {dt/nb*1e6:.1f} us/block  "
          f"maxerr LU {err:.2e} inv {ierr:.2e}")


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "grid"):
        bench_grid()
    if which in ("all", "dma"):
        for bs in (32, 64, 128):
            bench_dma(bs)
    if which in ("all", "dot"):
        bench_dots(128, 8)
        bench_dots(128, 4)
        bench_dots(32, 8)
        bench_dots(64, 8)
    if which in ("all", "lu"):
        bench_lu(128, 64)
        bench_lu(32, 64)
