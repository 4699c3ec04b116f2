"""Round-2 spikes, part 3.

A: in-kernel masked block_lu_inv (+inverses) at bs in {32, 64, 128} —
   needed by the fused whole-factorization kernel.
B: lane-padded sub-128 Schur RMW: pool tiles (bs, 128), L lane-sliced to
   (bs,bs) for the dot, product written over the full tile.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superlu_dist_tpu.ops.kernels.blocklu import block_lu_inv


def timeit(fn, *args, reps=20):
    out = fn(*args)
    (out[0] if isinstance(out, (tuple, list)) else out).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    (out[0] if isinstance(out, (tuple, list)) else out).block_until_ready()
    return (time.perf_counter() - t0) / reps


def spike_a():
    print("== A: in-kernel masked block_lu_inv (lane-padded tiles) ==")
    rng = np.random.default_rng(0)
    for BS, C, ND in ((32, 8, 256), (64, 8, 128), (128, 4, 64)):
        nslots = max(ND, 256)
        blocks = rng.standard_normal((nslots, BS, BS)) + 4 * np.eye(BS)
        pool = np.zeros((nslots, BS, 128), np.float32)
        pool[:, :, :BS] = blocks
        pool = jnp.asarray(pool)
        dsl = rng.choice(nslots, ND, replace=False).astype(np.int32)

        def diag_kernel(dsl_ref, pool_ref, out_ref, linv_ref, uinv_ref,
                        sD, sL, sU, semD, semW):
            g = jnp.asarray(pl.program_id(0), jnp.int32)
            base = g * jnp.int32(C)
            for j in range(C):
                pltpu.make_async_copy(pool_ref.at[dsl_ref[base + j]],
                                      sD.at[jnp.int32(j)], semD.at[jnp.int32(j)]).start()
            for j in range(C):
                pltpu.make_async_copy(pool_ref.at[dsl_ref[base + j]],
                                      sD.at[jnp.int32(j)], semD.at[jnp.int32(j)]).wait()
                D = sD[jnp.int32(j)][:, :BS]
                LU, linv, uinv, nt = block_lu_inv(
                    D, jnp.float32(1e-10), masked=True)
                z = jnp.zeros((BS, 128 - BS), jnp.float32) if BS < 128 else None
                if BS < 128:
                    sD[jnp.int32(j)] = jnp.concatenate([LU, z], axis=1)
                    sL[jnp.int32(j)] = jnp.concatenate([linv, z], axis=1)
                    sU[jnp.int32(j)] = jnp.concatenate([uinv, z], axis=1)
                else:
                    sD[jnp.int32(j)] = LU
                    sL[jnp.int32(j)] = linv
                    sU[jnp.int32(j)] = uinv
            for j in range(C):
                pltpu.make_async_copy(sD.at[jnp.int32(j)], out_ref.at[dsl_ref[base + j]],
                                      semW.at[jnp.int32(j)]).start()
                pltpu.make_async_copy(sL.at[jnp.int32(j)], linv_ref.at[dsl_ref[base + j]],
                                      semW.at[jnp.int32(j)]).start()
                pltpu.make_async_copy(sU.at[jnp.int32(j)], uinv_ref.at[dsl_ref[base + j]],
                                      semW.at[jnp.int32(j)]).start()
            for j in range(C):
                pltpu.make_async_copy(sD.at[jnp.int32(j)], out_ref.at[dsl_ref[base + j]],
                                      semW.at[jnp.int32(j)]).wait()
                pltpu.make_async_copy(sL.at[jnp.int32(j)], linv_ref.at[dsl_ref[base + j]],
                                      semW.at[jnp.int32(j)]).wait()
                pltpu.make_async_copy(sU.at[jnp.int32(j)], uinv_ref.at[dsl_ref[base + j]],
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
            ref = jax.jit(jax.vmap(block_lu_inv, in_axes=(0, None)))(
                pool[dsl][:, :, :BS], jnp.float32(1e-10))
            err = float(jnp.abs(out[0][dsl][:, :, :BS] - ref[0]).max())
            erri = float(jnp.abs(out[1][dsl][:, :, :BS] - ref[1]).max())
            print(f"  bs={BS:4d} diag x{ND}: {dt*1e3:8.3f} ms "
                  f"({dt/ND*1e6:6.2f} us/diag)  err={err:.2e}/{erri:.2e} "
                  f"compile={compile_t:.0f}s")
        except Exception as e:
            print(f"  bs={BS}: FAILED: {type(e).__name__}: {str(e)[:300]}")


def spike_b():
    print("== B: lane-padded Schur RMW ==")
    rng = np.random.default_rng(0)
    for BS, C, NT in ((32, 16, 32768), (64, 16, 8192), (128, 8, 2048)):
        nslots = 4096
        blocks = rng.standard_normal((nslots, BS, BS)).astype(np.float32)
        pool = np.zeros((nslots, BS, 128), np.float32)
        pool[:, :, :BS] = blocks
        pool = jnp.asarray(pool)
        n_windows = NT // C
        gl = rng.integers(0, nslots, NT).astype(np.int32)
        gu = rng.integers(0, nslots, NT).astype(np.int32)
        gt = np.empty(NT, np.int32)
        for w in range(n_windows):
            gt[w * C:(w + 1) * C] = rng.choice(nslots, C, replace=False)

        def kern(gl_ref, gu_ref, gt_ref, pool_ref, out_ref,
                 sL, sU, sT, semL, semU, semT, semW):
            g = jnp.asarray(pl.program_id(0), jnp.int32)
            base = g * jnp.int32(C)
            for j in range(C):
                pltpu.make_async_copy(pool_ref.at[gl_ref[base + j]],
                                      sL.at[jnp.int32(j)], semL.at[jnp.int32(j)]).start()
                pltpu.make_async_copy(pool_ref.at[gu_ref[base + j]],
                                      sU.at[jnp.int32(j)], semU.at[jnp.int32(j)]).start()
                pltpu.make_async_copy(pool_ref.at[gt_ref[base + j]],
                                      sT.at[jnp.int32(j)], semT.at[jnp.int32(j)]).start()
            for j in range(C):
                pltpu.make_async_copy(pool_ref.at[gl_ref[base + j]],
                                      sL.at[jnp.int32(j)], semL.at[jnp.int32(j)]).wait()
                pltpu.make_async_copy(pool_ref.at[gu_ref[base + j]],
                                      sU.at[jnp.int32(j)], semU.at[jnp.int32(j)]).wait()
                pltpu.make_async_copy(pool_ref.at[gt_ref[base + j]],
                                      sT.at[jnp.int32(j)], semT.at[jnp.int32(j)]).wait()
                L = sL[jnp.int32(j)][:, :BS]
                sT[jnp.int32(j)] = sT[jnp.int32(j)] - jnp.dot(L, sU[jnp.int32(j)], precision="highest",
                                        preferred_element_type=jnp.float32)
                pltpu.make_async_copy(sT.at[jnp.int32(j)], out_ref.at[gt_ref[base + j]],
                                      semW.at[jnp.int32(j)]).start()
            for j in range(C):
                pltpu.make_async_copy(sT.at[jnp.int32(j)], out_ref.at[gt_ref[base + j]],
                                      semW.at[jnp.int32(j)]).wait()

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_windows,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((C, BS, 128), jnp.float32)] * 3
            + [pltpu.SemaphoreType.DMA((C,))] * 4,
        )

        @jax.jit
        def call(pool, gl, gu, gt):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
                grid_spec=grid_spec,
                input_output_aliases={3: 0},
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(gl, gu, gt, pool)

        try:
            t0 = time.time()
            out = call(pool, jnp.asarray(gl), jnp.asarray(gu),
                       jnp.asarray(gt))
            out.block_until_ready()
            ct = time.time() - t0
            # correctness on window 0
            O = np.asarray(out)[:, :, :BS]
            P, ok = blocks.copy(), True
            for j in range(C):
                t = gt[j]
                exp = P[t] - P[gl[j]][:, :BS] @ P[gu[j]]
                if np.abs(O[t] - exp).max() > 1e-3 * max(1, np.abs(exp).max()):
                    ok = False
            dt = timeit(call, pool, jnp.asarray(gl), jnp.asarray(gu),
                        jnp.asarray(gt))
            fl = 2 * NT * BS**3
            print(f"  bs={BS:4d} C={C} triples={NT}: {dt*1e3:8.3f} ms  "
                  f"{dt/NT*1e9:7.1f} ns/triple  {fl/dt/1e12:6.2f} TF/s "
                  f"padded  correct={ok}  compile={ct:.0f}s")
        except Exception as e:
            print(f"  bs={BS}: FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ab"
    print("device:", jax.devices()[0].device_kind)
    if "a" in which:
        spike_a()
    if "b" in which:
        spike_b()
