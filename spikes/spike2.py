"""S1b/S1c: flat-pool layout experiments for sub-128 blocks.

Pool stored (nslots*8, 128) f32 — bit-identical to (nslots,32,32) row-major.
A slot is the aligned slice pool[8s:8s+8, :]; in-kernel reshape (8,128) ->
(32,32) (pure row-major reinterpretation) feeds the MXU.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 32
PK = (BS * BS) // 128   # packed rows per slot = 8


def timeit(fn, *args, reps=20):
    out = fn(*args)
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    return (time.perf_counter() - t0) / reps


def s1b():
    print("== S1b: flat-pool per-triple RMW at bs=32 ==")
    rng = np.random.default_rng(0)
    C, NT, nslots = 16, 32768, 4096
    pool = jnp.asarray(rng.standard_normal((nslots * PK, 128)), jnp.float32)
    n_windows = NT // C
    gl = (rng.integers(0, nslots, NT) * PK).astype(np.int32)
    gu = (rng.integers(0, nslots, NT) * PK).astype(np.int32)
    gt = np.empty(NT, np.int32)
    for w in range(n_windows):
        gt[w * C:(w + 1) * C] = rng.choice(nslots, C, replace=False) * PK

    def kern(gl_ref, gu_ref, gt_ref, pool_ref, out_ref, sL, sU, sT,
             semL, semU, semT, semW):
        g = pl.program_id(0)
        base = g * C
        for j in range(C):
            pltpu.make_async_copy(pool_ref.at[pl.ds(gl_ref[base + j], PK)],
                                  sL.at[j], semL.at[j]).start()
            pltpu.make_async_copy(pool_ref.at[pl.ds(gu_ref[base + j], PK)],
                                  sU.at[j], semU.at[j]).start()
            pltpu.make_async_copy(pool_ref.at[pl.ds(gt_ref[base + j], PK)],
                                  sT.at[j], semT.at[j]).start()
        for j in range(C):
            pltpu.make_async_copy(pool_ref.at[pl.ds(gl_ref[base + j], PK)],
                                  sL.at[j], semL.at[j]).wait()
            pltpu.make_async_copy(pool_ref.at[pl.ds(gu_ref[base + j], PK)],
                                  sU.at[j], semU.at[j]).wait()
            pltpu.make_async_copy(pool_ref.at[pl.ds(gt_ref[base + j], PK)],
                                  sT.at[j], semT.at[j]).wait()
            L = sL[j].reshape(BS, BS)
            U = sU[j].reshape(BS, BS)
            T = sT[j].reshape(BS, BS)
            T = T - jnp.dot(L, U, precision="highest",
                            preferred_element_type=jnp.float32)
            sT[j] = T.reshape(PK, 128)
            pltpu.make_async_copy(sT.at[j],
                                  out_ref.at[pl.ds(gt_ref[base + j], PK)],
                                  semW.at[j]).start()
        for j in range(C):
            pltpu.make_async_copy(sT.at[j],
                                  out_ref.at[pl.ds(gt_ref[base + j], PK)],
                                  semW.at[j]).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_windows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((C, PK, 128), jnp.float32)] * 3
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
        out = call(pool, jnp.asarray(gl), jnp.asarray(gu), jnp.asarray(gt))
        out.block_until_ready()
        ct = time.time() - t0
        # correctness vs numpy for first window
        P = np.asarray(pool).reshape(nslots, BS, BS)
        O = np.asarray(out).reshape(nslots, BS, BS)
        w = 0
        ok = True
        for j in range(C):
            l, u, t = gl[j] // PK, gu[j] // PK, gt[j] // PK
            want = P[t] - P[l] @ P[u]
            if np.abs(O[t] - want).max() > 1e-4:
                ok = False
        dt = timeit(call, pool, jnp.asarray(gl), jnp.asarray(gu),
                    jnp.asarray(gt))
        fl = 2 * NT * BS**3
        print(f"  C={C} triples={NT}: {dt*1e3:8.3f} ms  "
              f"{dt/NT*1e9:7.1f} ns/triple  {fl/dt/1e12:6.2f} TF/s padded  "
              f"correct={ok}  compile={ct:.0f}s")
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:6000]}")


def s1c():
    print("== S1c: flat-pool PANEL gemm + per-target RMW at bs=32 ==")
    rng = np.random.default_rng(0)
    for (M, N, NSTEP) in ((16, 16, 256), (24, 24, 128), (8, 8, 1024)):
        nslots = 16384
        pool = jnp.asarray(rng.standard_normal((nslots * PK, 128)),
                           jnp.float32)
        lbase = (rng.integers(0, nslots - M, NSTEP) * PK).astype(np.int32)
        ubase = (rng.integers(0, nslots - N, NSTEP) * PK).astype(np.int32)
        tgt = np.stack([rng.choice(nslots, M * N, replace=False) * PK
                        for _ in range(NSTEP)]).astype(np.int32)
        MN = M * N

        def kern(lb_ref, ub_ref, tg_ref, pool_ref, out_ref,
                 sL, sU, sV, sT, semL, semU, semT, semW):
            g = pl.program_id(0)
            pltpu.make_async_copy(pool_ref.at[pl.ds(lb_ref[g], M * PK)],
                                  sL, semL).start()
            pltpu.make_async_copy(pool_ref.at[pl.ds(ub_ref[g], N * PK)],
                                  sU, semU).start()
            for j in range(MN):
                pltpu.make_async_copy(
                    pool_ref.at[pl.ds(tg_ref[g * MN + j], PK)],
                    sT.at[j], semT.at[j % 8]).start()
            pltpu.make_async_copy(pool_ref.at[pl.ds(lb_ref[g], M * PK)],
                                  sL, semL).wait()
            pltpu.make_async_copy(pool_ref.at[pl.ds(ub_ref[g], N * PK)],
                                  sU, semU).wait()
            L2 = sL[...].reshape(M * BS, BS)
            U3 = sU[...].reshape(N, BS, BS)
            U2 = jnp.swapaxes(U3, 0, 1).reshape(BS, N * BS)
            V = jnp.dot(L2, U2, precision="highest",
                        preferred_element_type=jnp.float32)
            sV[...] = V.reshape(M, BS, N, BS).transpose(0, 2, 1, 3).reshape(
                MN * PK, 128)
            for j in range(MN):
                pltpu.make_async_copy(
                    pool_ref.at[pl.ds(tg_ref[g * MN + j], PK)],
                    sT.at[j], semT.at[j % 8]).wait()
            sT[...] = sT[...] - sV[...].reshape(MN, PK, 128)
            for j in range(MN):
                pltpu.make_async_copy(sT.at[j],
                                      out_ref.at[pl.ds(tg_ref[g * MN + j],
                                                       PK)],
                                      semW.at[j % 8]).start()
            for j in range(MN):
                pltpu.make_async_copy(sT.at[j],
                                      out_ref.at[pl.ds(tg_ref[g * MN + j],
                                                       PK)],
                                      semW.at[j % 8]).wait()

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(NSTEP,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((M * PK, 128), jnp.float32),
                            pltpu.VMEM((N * PK, 128), jnp.float32),
                            pltpu.VMEM((MN * PK, 128), jnp.float32),
                            pltpu.VMEM((MN, PK, 128), jnp.float32)]
            + [pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
               pltpu.SemaphoreType.DMA((8,)), pltpu.SemaphoreType.DMA((8,))],
        )

        @jax.jit
        def call(pool, lb, ub, tg):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
                grid_spec=grid_spec,
                input_output_aliases={3: 0},
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(lb, ub, tg.ravel(), pool)

        try:
            t0 = time.time()
            out = call(pool, jnp.asarray(lbase), jnp.asarray(ubase),
                       jnp.asarray(tgt))
            out.block_until_ready()
            ct = time.time() - t0
            P = np.asarray(pool).reshape(nslots, BS, BS)
            O = np.asarray(out).reshape(nslots, BS, BS)
            g = 0
            Lp = P[lbase[g] // PK: lbase[g] // PK + M].reshape(M * BS, BS)
            Up = np.swapaxes(P[ubase[g] // PK: ubase[g] // PK + N],
                             0, 1).reshape(BS, N * BS)
            V = (Lp @ Up).reshape(M, BS, N, BS)
            ok = True
            for i in range(M):
                for jn in range(N):
                    t = tgt[g, i * N + jn] // PK
                    if np.abs(O[t] - (P[t] - V[i, :, jn, :])).max() > 1e-3:
                        ok = False
            dt = timeit(call, pool, jnp.asarray(lbase), jnp.asarray(ubase),
                        jnp.asarray(tgt))
            NT = NSTEP * MN
            fl = 2 * NT * BS**3
            print(f"  {M}x{N} x{NSTEP} ({NT} triples): {dt*1e3:8.3f} ms  "
                  f"{dt/NT*1e9:7.1f} ns/triple  {fl/dt/1e12:6.2f} TF/s "
                  f"padded  correct={ok}  compile={ct:.0f}s")
        except Exception as e:
            print(f"  {M}x{N}: FAILED: {type(e).__name__}: {str(e)[:6000]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "bc"
    print("device:", jax.devices()[0].device_kind)
    if "b" in which:
        s1b()
    if "c" in which:
        s1c()
