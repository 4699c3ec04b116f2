"""Round-2 feasibility spikes on the real TPU (not shipped; exploratory).

S1: per-triple Schur RMW kernel at bs in {32, 64, 128} — measures the
    per-lane DMA+GEMM cost that bounds a small-block tape executor.
S2: in-kernel recursive block_lu_inv (the diag op of a fused factorization
    kernel) — does Mosaic compile it, and how fast is it?
S3: panel GEMM: one DMA per contiguous panel + one big GEMM + per-target
    RMW write-back (the bigV formulation) — measures the alternative.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    return (time.perf_counter() - t0) / reps


# ---------------------------------------------------------------- S1
def schur_kernel(C, BS):
    def kern(gl_ref, gu_ref, gt_ref, pool_ref, out_ref, sL, sU, sT,
             semL, semU, semT, semW):
        g = pl.program_id(0)
        base = g * C
        for j in range(C):
            pltpu.make_async_copy(pool_ref.at[gl_ref[base + j]],
                                  sL.at[j], semL.at[j]).start()
            pltpu.make_async_copy(pool_ref.at[gu_ref[base + j]],
                                  sU.at[j], semU.at[j]).start()
            pltpu.make_async_copy(pool_ref.at[gt_ref[base + j]],
                                  sT.at[j], semT.at[j]).start()
        for j in range(C):
            pltpu.make_async_copy(pool_ref.at[gl_ref[base + j]],
                                  sL.at[j], semL.at[j]).wait()
            pltpu.make_async_copy(pool_ref.at[gu_ref[base + j]],
                                  sU.at[j], semU.at[j]).wait()
            pltpu.make_async_copy(pool_ref.at[gt_ref[base + j]],
                                  sT.at[j], semT.at[j]).wait()
            sT[j] = sT[j] - jnp.dot(sL[j], sU[j], precision="highest",
                                    preferred_element_type=jnp.float32)
            pltpu.make_async_copy(sT.at[j], out_ref.at[gt_ref[base + j]],
                                  semW.at[j]).start()
        for j in range(C):
            pltpu.make_async_copy(sT.at[j], out_ref.at[gt_ref[base + j]],
                                  semW.at[j]).wait()
    return kern


def make_schur(n_windows, C, BS, pool_shape):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_windows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((C, BS, BS), jnp.float32)] * 3
        + [pltpu.SemaphoreType.DMA((C,))] * 4,
    )

    @jax.jit
    def call(pool, gl, gu, gt):
        return pl.pallas_call(
            schur_kernel(C, BS),
            out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
            grid_spec=grid_spec,
            input_output_aliases={3: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(gl, gu, gt, pool)
    return call


def s1():
    print("== S1: per-triple RMW throughput ==")
    rng = np.random.default_rng(0)
    for BS, C, NT in ((32, 16, 32768), (64, 16, 8192), (128, 8, 2048)):
        nslots = 4096
        pool = jnp.asarray(rng.standard_normal((nslots, BS, BS)),
                           jnp.float32)
        n_windows = NT // C
        gl = rng.integers(0, nslots, NT).astype(np.int32)
        gu = rng.integers(0, nslots, NT).astype(np.int32)
        # distinct targets within each window
        gt = np.empty(NT, np.int32)
        for w in range(n_windows):
            gt[w * C:(w + 1) * C] = rng.choice(nslots, C, replace=False)
        call = make_schur(n_windows, C, BS, pool.shape)
        t0 = time.time()
        dt = timeit(call, pool, jnp.asarray(gl), jnp.asarray(gu),
                    jnp.asarray(gt))
        fl = 2 * NT * BS**3
        print(f"  bs={BS:4d} C={C} triples={NT}: {dt*1e3:8.3f} ms  "
              f"{dt/NT*1e9:7.1f} ns/triple  {fl/dt/1e12:6.2f} TF/s padded  "
              f"(compile {time.time()-t0-dt*20:.0f}s)")


# ---------------------------------------------------------------- S2
def s2():
    print("== S2: in-kernel block_lu_inv ==")
    from superlu_dist_tpu.ops.kernels.blocklu import block_lu_inv
    rng = np.random.default_rng(0)
    for BS, C, ND in ((32, 8, 512), (128, 4, 64)):
        nslots = max(ND, 512)
        pool = jnp.asarray(
            rng.standard_normal((nslots, BS, BS)) + 4 * np.eye(BS),
            jnp.float32)
        dsl = rng.choice(nslots, ND, replace=False).astype(np.int32)

        def diag_kernel(dsl_ref, pool_ref, out_ref, linv_ref, uinv_ref,
                        sD, sL, sU, semD, semW):
            g = pl.program_id(0)
            base = g * C
            for j in range(C):
                pltpu.make_async_copy(pool_ref.at[dsl_ref[base + j]],
                                      sD.at[j], semD.at[j]).start()
            for j in range(C):
                pltpu.make_async_copy(pool_ref.at[dsl_ref[base + j]],
                                      sD.at[j], semD.at[j]).wait()
            D = sD[...]
            LU, linv, uinv, nt = jax.vmap(block_lu_inv, in_axes=(0, None))(
                D, jnp.float32(1e-10))
            sD[...] = LU
            sL[...] = linv
            sU[...] = uinv
            for j in range(C):
                pltpu.make_async_copy(sD.at[j], out_ref.at[dsl_ref[base + j]],
                                      semW.at[j]).start()
                pltpu.make_async_copy(sL.at[j], linv_ref.at[dsl_ref[base + j]],
                                      semW.at[j]).start()
                pltpu.make_async_copy(sU.at[j], uinv_ref.at[dsl_ref[base + j]],
                                      semW.at[j]).start()
            for j in range(C):
                pltpu.make_async_copy(sD.at[j], out_ref.at[dsl_ref[base + j]],
                                      semW.at[j]).wait()
                pltpu.make_async_copy(sL.at[j], linv_ref.at[dsl_ref[base + j]],
                                      semW.at[j]).wait()
                pltpu.make_async_copy(sU.at[j], uinv_ref.at[dsl_ref[base + j]],
                                      semW.at[j]).wait()

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ND // C,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            scratch_shapes=[pltpu.VMEM((C, BS, BS), jnp.float32)] * 3
            + [pltpu.SemaphoreType.DMA((C,))] * 2,
        )

        @jax.jit
        def call(pool, dsl):
            return pl.pallas_call(
                diag_kernel,
                out_shape=[jax.ShapeDtypeStruct(pool.shape, pool.dtype)] * 3,
                grid_spec=grid_spec,
                input_output_aliases={1: 0},
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(dsl, pool)

        try:
            t0 = time.time()
            out = call(pool, jnp.asarray(dsl))
            out[0].block_until_ready()
            compile_t = time.time() - t0
            dt = timeit(call, pool, jnp.asarray(dsl))
            # verify numerics vs XLA
            ref = jax.jit(jax.vmap(block_lu_inv, in_axes=(0, None)))(
                pool[dsl], jnp.float32(1e-10))
            err = float(jnp.abs(out[0][dsl] - ref[0]).max())
            erri = float(jnp.abs(out[1][dsl] - ref[1]).max())
            print(f"  bs={BS:4d} diag x{ND}: {dt*1e3:8.3f} ms "
                  f"({dt/ND*1e6:6.2f} us/diag)  err={err:.2e}/{erri:.2e} "
                  f"compile={compile_t:.0f}s")
        except Exception as e:
            print(f"  bs={BS}: FAILED: {type(e).__name__}: {str(e)[:200]}")


# ---------------------------------------------------------------- S3
def s3():
    print("== S3: panel GEMM + per-target RMW ==")
    rng = np.random.default_rng(0)
    BS = 32
    # typical mid-factorization step at bs=32: m=n=20 panels
    for (M, N, NSTEP, C) in ((16, 16, 256, 8), (8, 8, 1024, 8)):
        nslots = 16384
        pool = jnp.asarray(rng.standard_normal((nslots, BS, BS)),
                           jnp.float32)
        # per step: L panel at lbase (M contiguous), U at ubase (N contig),
        # M*N random distinct targets
        lbase = rng.integers(0, nslots - M, NSTEP).astype(np.int32)
        ubase = rng.integers(0, nslots - N, NSTEP).astype(np.int32)
        tgt = np.stack([rng.choice(nslots, M * N, replace=False)
                        for _ in range(NSTEP)]).astype(np.int32)

        def panel_kernel(lb_ref, ub_ref, tg_ref, pool_ref, out_ref,
                         sL, sU, sV, sT, semL, semU, semT, semW):
            g = pl.program_id(0)
            pltpu.make_async_copy(
                pool_ref.at[pl.ds(lb_ref[g], M)], sL, semL).start()
            pltpu.make_async_copy(
                pool_ref.at[pl.ds(ub_ref[g], N)], sU, semU).start()
            # prefetch all targets
            for j in range(M * N):
                pltpu.make_async_copy(pool_ref.at[tg_ref[g * M * N + j]],
                                      sT.at[j], semT.at[j % C]).start()
            pltpu.make_async_copy(
                pool_ref.at[pl.ds(lb_ref[g], M)], sL, semL).wait()
            pltpu.make_async_copy(
                pool_ref.at[pl.ds(ub_ref[g], N)], sU, semU).wait()
            L2 = sL[...].reshape(M * BS, BS)
            U2 = jnp.swapaxes(sU[...], 0, 1).reshape(BS, N * BS)
            sV[...] = jnp.dot(L2, U2, precision="highest",
                              preferred_element_type=jnp.float32)
            for j in range(M * N):
                pltpu.make_async_copy(pool_ref.at[tg_ref[g * M * N + j]],
                                      sT.at[j], semT.at[j % C]).wait()
            V = sV[...].reshape(M, BS, N, BS)
            for i in range(M):
                for jn in range(N):
                    j = i * N + jn
                    sT[j] = sT[j] - V[i, :, jn, :]
            for j in range(M * N):
                pltpu.make_async_copy(sT.at[j],
                                      out_ref.at[tg_ref[g * M * N + j]],
                                      semW.at[j % C]).start()
            for j in range(M * N):
                pltpu.make_async_copy(sT.at[j],
                                      out_ref.at[tg_ref[g * M * N + j]],
                                      semW.at[j % C]).wait()

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(NSTEP,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((M, BS, BS), jnp.float32),
                            pltpu.VMEM((N, BS, BS), jnp.float32),
                            pltpu.VMEM((M * BS, N * BS), jnp.float32),
                            pltpu.VMEM((M * N, BS, BS), jnp.float32)]
            + [pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
               pltpu.SemaphoreType.DMA((C,)), pltpu.SemaphoreType.DMA((C,))],
        )

        @jax.jit
        def call(pool, lb, ub, tg):
            return pl.pallas_call(
                panel_kernel,
                out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
                grid_spec=grid_spec,
                input_output_aliases={3: 0},
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(lb, ub, tg.ravel(), pool)

        try:
            t0 = time.time()
            call(pool, jnp.asarray(lbase), jnp.asarray(ubase),
                 jnp.asarray(tgt)).block_until_ready()
            ct = time.time() - t0
            dt = timeit(call, pool, jnp.asarray(lbase), jnp.asarray(ubase),
                        jnp.asarray(tgt))
            NT = NSTEP * M * N
            fl = 2 * NT * BS**3
            print(f"  bs={BS} {M}x{N} x{NSTEP} steps ({NT} triples): "
                  f"{dt*1e3:8.3f} ms  {dt/NT*1e9:7.1f} ns/triple  "
                  f"{fl/dt/1e12:6.2f} TF/s padded  compile={ct:.0f}s")
        except Exception as e:
            print(f"  {M}x{N}: FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "123"
    print("device:", jax.devices()[0].device_kind)
    if "1" in which:
        s1()
    if "2" in which:
        s2()
    if "3" in which:
        s3()
