"""Spike 19: column-finalize cost breakdown (standalone pallas kernels).

spike18 showed fin jobs are 61% of clk factor time (~49us/column on
lap3d32). fin = blocked diag LU (+inverse assembly) + serial TRSM chain
+ panel store. Isolate each with a grid of N identical jobs:
  a. diag LU only (_lu_tile_blocked, pb sweep)
  b. TRSM: serial per-block dots (current) vs chunked wide dots
"""

import sys
import time
import functools

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superlu_dist_tpu.ops.kernels.flk import _lu_tile_blocked

N = 256
S = 33          # panel rows for the TRSM test
bs = 128


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 10)
    return best


def diag_kernel(pb):
    def kern(x_ref, o_ref, sT, sem):
        j = pl.program_id(0)
        pltpu.make_async_copy(x_ref.at[j], sT, sem).start()
        pltpu.make_async_copy(x_ref.at[j], sT, sem).wait()
        LU, li, ui, nt = _lu_tile_blocked(sT[...], jnp.float32(0.0), pb=pb)
        sT[...] = LU + li + ui
        pltpu.make_async_copy(sT, o_ref.at[j], sem).start()
        pltpu.make_async_copy(sT, o_ref.at[j], sem).wait()

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, bs, bs), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(N,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[pltpu.VMEM((bs, bs), jnp.float32),
                                pltpu.SemaphoreType.DMA(())]),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)
    return run


def trsm_kernel(mode, nl=8, ck=8):
    """panel rows [1, 1+nl) TRSM'd against u: serial dots vs wide chunks."""
    def kern(x_ref, o_ref, sP, sU, sem):
        j = pl.program_id(0)
        pltpu.make_async_copy(x_ref.at[pl.ds(0, S)], sP, sem).start()
        pltpu.make_async_copy(x_ref.at[pl.ds(0, S)], sP, sem).wait()

        def dot(a, b):
            return jnp.dot(a, b, precision="highest",
                           preferred_element_type=jnp.float32)
        sU[...] = sP[0]
        if mode == "serial":
            def body(p, u):
                sP[p] = dot(sP[p], u)
                return u
            lax.fori_loop(1, 1 + nl, body, sU[...])
        else:
            nch = -(-nl // ck)
            def body(c, u):
                r0 = 1 + c * ck
                blkv = sP[pl.ds(r0, ck)]
                R = dot(blkv.reshape(ck * bs, bs), u)
                sP[pl.ds(r0, ck)] = R.reshape(ck, bs, bs)
                return u
            lax.fori_loop(0, nch, body, sU[...])
        pltpu.make_async_copy(sP, o_ref.at[pl.ds(0, S)], sem).start()
        pltpu.make_async_copy(sP, o_ref.at[pl.ds(0, S)], sem).wait()

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, bs, bs), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(N,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[pltpu.VMEM((S, bs, bs), jnp.float32),
                                pltpu.VMEM((bs, bs), jnp.float32),
                                pltpu.SemaphoreType.DMA(())]),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)
    return run


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, bs, bs)).astype(np.float32)
                    + 4 * np.eye(bs, dtype=np.float32))
    for pb in (16, 32, 64):
        try:
            t = timeit(diag_kernel(pb), X)
            print(f"diagLU pb={pb}: {t/N*1e6:6.1f} us/job", flush=True)
        except Exception as e:
            print(f"diagLU pb={pb}: FAILED {type(e).__name__}", flush=True)
    P = jnp.asarray(rng.standard_normal((S, bs, bs)).astype(np.float32))
    for nl in (8, 24):
        t = timeit(trsm_kernel("serial", nl=nl), P)
        print(f"trsm serial nl={nl}: {t/N*1e6:6.1f} us/job", flush=True)
        t = timeit(trsm_kernel("chunk", nl=nl, ck=8), P)
        print(f"trsm chunk8 nl={nl}: {t/N*1e6:6.1f} us/job", flush=True)
