"""Bisect the in-kernel LU compile failure: which piece kills Mosaic?"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superlu_dist_tpu.ops.kernels import blocklu as _bl


def run_case(name, BS, body):
    """body(D: (BS,BS) f32 from VMEM) -> (BS,BS) f32 written back."""
    rng = np.random.default_rng(0)
    nslots, C, ND = 64, 4, 16
    blocks = rng.standard_normal((nslots, BS, BS)) + 4 * np.eye(BS)
    pool = np.zeros((nslots, BS, 128), np.float32)
    pool[:, :, :BS] = blocks
    pool = jnp.asarray(pool)
    dsl = rng.choice(nslots, ND, replace=False).astype(np.int32)

    def kern(dsl_ref, pool_ref, out_ref, sD, semD, semW):
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
            D = sD[jnp.int32(j)][:, :BS]
            R = body(D)
            if BS < 128:
                R = jnp.concatenate(
                    [R, jnp.zeros((BS, 128 - BS), jnp.float32)], axis=1)
            sD[jnp.int32(j)] = R
            pltpu.make_async_copy(sD.at[jnp.int32(j)],
                                  out_ref.at[dsl_ref[base + j]],
                                  semW.at[jnp.int32(j)]).start()
        for j in range(C):
            pltpu.make_async_copy(sD.at[jnp.int32(j)],
                                  out_ref.at[dsl_ref[base + j]],
                                  semW.at[jnp.int32(j)]).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ND // C,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((C, BS, 128), jnp.float32)]
        + [pltpu.SemaphoreType.DMA((C,))] * 2,
    )

    @jax.jit
    def call(pool, dsl):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
            grid_spec=grid_spec,
            input_output_aliases={1: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(dsl, pool)

    try:
        t0 = time.time()
        out = call(pool, jnp.asarray(dsl))
        out.block_until_ready()
        ct = time.time() - t0
        print(f"  {name} bs={BS}: OK  compile={ct:.1f}s")
        return np.asarray(out)
    except Exception as e:
        print(f"  {name} bs={BS}: FAILED: {type(e).__name__}: {str(e)[:150]}")
        return None


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("device:", jax.devices()[0].device_kind)
    th = 1e-10  # python literal: avoids captured-constant error

    if which in ("all", "1"):
        # 1: identity (baseline: lane slice + concat only)
        run_case("identity", 32, lambda D: D + 1.0)
    if which in ("all", "2"):
        # 2: masked base-case LU only, on the top-left 8x8
        def base_only(D):
            lu8, _ = _bl._lu_base_masked(D[:8, :8], th)
            return D.at[:8, :8].set(lu8) if False else \
                jnp.concatenate([
                    jnp.concatenate([lu8, D[:8, 8:]], axis=1), D[8:, :]],
                    axis=0)
        run_case("lu_base_masked(8x8)", 32, base_only)
    if which in ("all", "3"):
        # 3: masked base inverses on 8x8
        def base_inv(D):
            lu8, _ = _bl._lu_base_masked(D[:8, :8], th)
            li, ui = _bl._base_invs_masked(lu8)
            return jnp.concatenate([
                jnp.concatenate([li @ ui, D[:8, 8:]], axis=1), D[8:, :]],
                axis=0)
        run_case("base_invs_masked(8x8)", 32, base_inv)
    if which in ("all", "4"):
        # 4: full recursion at 16
        def rec16(D):
            LU, li, ui, _ = _bl.block_lu_inv(D[:16, :16], th, masked=True)
            return jnp.concatenate([
                jnp.concatenate([LU + li + ui, D[:16, 16:]], axis=1),
                D[16:, :]], axis=0)
        run_case("block_lu_inv(16)", 32, rec16)
    if which in ("all", "5"):
        # 5: full recursion at 32
        def rec32(D):
            LU, li, ui, _ = _bl.block_lu_inv(D, th, masked=True)
            return LU + li + ui
        run_case("block_lu_inv(32)", 32, rec32)
    if which in ("all", "6"):
        def rec128(D):
            LU, li, ui, _ = _bl.block_lu_inv(D, th, masked=True)
            return LU + li + ui
        run_case("block_lu_inv(128)", 128, rec128)
