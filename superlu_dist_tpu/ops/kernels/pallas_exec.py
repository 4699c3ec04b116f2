"""Pallas TPU kernels for the tape-driven block-sparse LU (B = 128).

Motivation (measured on TPU v5e): XLA gather/scatter/matmul ops cost ~15µs
each regardless of size on this target, so the per-chunk
gather → batched-GEMM → scatter-add executor is op-overhead-bound. A Pallas
kernel that walks a whole tape segment with explicit async DMAs costs one
call (~45µs) plus ~0.1µs per block — per-block work becomes DMA issue +
MXU time instead of op dispatch.

Kernels (one ``pallas_call`` per elimination-level phase):
- ``schur``: per tape lane, DMA the L, U, and target blocks HBM→VMEM,
  target -= L @ U at precision=highest (verified f32-accurate in Mosaic),
  DMA back. TPU grid steps are sequential, so read-modify-write hazards
  only need care *within* a DMA window: the host window-schedules the tape
  so no two lanes of one window share a target (fillers read the zero
  block and write the trash block).
- ``trsm``: panel solve against a diagonal inverse: X <- X @ Uinv (L
  panels) or X <- Linv @ X (U panels), inverses DMA'd from the linv/uinv
  arrays produced by the XLA diagonal batch.

DMA alignment on TPU requires the last dim to be a multiple of 128, so the
Pallas path requires block size 128 (the MXU tile — the configuration the
solver wants on TPU anyway).

Reference analog: the CUDA Schur/scatter kernels
(reference: SRC/cuda/dsuperlu_gpu.cu:177-413 Scatter_GPU_kernel + cublas
streams), recast as tape-driven sequential-grid kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..host.symbolic import SymbolicPlan
from . import blocklu as _bl

BS = 128          # the Pallas path's block size (MXU tile, DMA-aligned)


def _dot(a, b, exact):
    prec = "highest" if exact else "default"
    return jnp.dot(a, b, precision=prec, preferred_element_type=jnp.float32)


def _schur_kernel(C, exact):
    def kern(bounds_ref, gl_ref, gu_ref, gt_ref, pool_ref, out_ref,
             sL, sU, sT, semL, semU, semT, semW):
        g = jnp.asarray(pl.program_id(0), jnp.int32)
        lo = jnp.asarray(bounds_ref[0], jnp.int32)
        hi = jnp.asarray(bounds_ref[1], jnp.int32)
        base = lo + g * jnp.int32(C)

        @pl.when(base < hi)
        def _step():

            for j in range(C):
                @pl.when(base + j < hi)
                def _():
                    pltpu.make_async_copy(pool_ref.at[gl_ref[base + j]],
                                          sL.at[jnp.int32(j)], semL.at[jnp.int32(j)]).start()
                    pltpu.make_async_copy(pool_ref.at[gu_ref[base + j]],
                                          sU.at[jnp.int32(j)], semU.at[jnp.int32(j)]).start()
                    pltpu.make_async_copy(pool_ref.at[gt_ref[base + j]],
                                          sT.at[jnp.int32(j)], semT.at[jnp.int32(j)]).start()
            for j in range(C):
                @pl.when(base + j < hi)
                def _():
                    pltpu.make_async_copy(pool_ref.at[gl_ref[base + j]],
                                          sL.at[jnp.int32(j)], semL.at[jnp.int32(j)]).wait()
                    pltpu.make_async_copy(pool_ref.at[gu_ref[base + j]],
                                          sU.at[jnp.int32(j)], semU.at[jnp.int32(j)]).wait()
                    pltpu.make_async_copy(pool_ref.at[gt_ref[base + j]],
                                          sT.at[jnp.int32(j)], semT.at[jnp.int32(j)]).wait()
                    sT[jnp.int32(j)] = sT[jnp.int32(j)] - _dot(sL[jnp.int32(j)], sU[jnp.int32(j)], exact)
                    pltpu.make_async_copy(sT.at[jnp.int32(j)], out_ref.at[gt_ref[base + j]],
                                          semW.at[jnp.int32(j)]).start()
            for j in range(C):
                @pl.when(base + j < hi)
                def _():
                    pltpu.make_async_copy(sT.at[jnp.int32(j)], out_ref.at[gt_ref[base + j]],
                                          semW.at[jnp.int32(j)]).wait()

    return kern


def _trsm_kernel(C, exact, left):
    """left=False: X <- X @ Dinv (L panels); left=True: X <- Dinv @ X."""

    def kern(bounds_ref, slot_ref, step_ref, pool_ref, dinv_ref, out_ref,
             sX, sD, semX, semD, semW):
        g = jnp.asarray(pl.program_id(0), jnp.int32)
        lo = jnp.asarray(bounds_ref[0], jnp.int32)
        hi = jnp.asarray(bounds_ref[1], jnp.int32)
        base = lo + g * jnp.int32(C)

        @pl.when(base < hi)
        def _step():

            for j in range(C):
                @pl.when(base + j < hi)
                def _():
                    pltpu.make_async_copy(pool_ref.at[slot_ref[base + j]],
                                          sX.at[jnp.int32(j)], semX.at[jnp.int32(j)]).start()
                    pltpu.make_async_copy(dinv_ref.at[step_ref[base + j]],
                                          sD.at[jnp.int32(j)], semD.at[jnp.int32(j)]).start()
            for j in range(C):
                @pl.when(base + j < hi)
                def _():
                    pltpu.make_async_copy(pool_ref.at[slot_ref[base + j]],
                                          sX.at[jnp.int32(j)], semX.at[jnp.int32(j)]).wait()
                    pltpu.make_async_copy(dinv_ref.at[step_ref[base + j]],
                                          sD.at[jnp.int32(j)], semD.at[jnp.int32(j)]).wait()
                    if left:
                        sX[jnp.int32(j)] = _dot(sD[jnp.int32(j)], sX[jnp.int32(j)], exact)
                    else:
                        sX[jnp.int32(j)] = _dot(sX[jnp.int32(j)], sD[jnp.int32(j)], exact)
                    pltpu.make_async_copy(sX.at[jnp.int32(j)],
                                          out_ref.at[slot_ref[base + j]],
                                          semW.at[jnp.int32(j)]).start()
            for j in range(C):
                @pl.when(base + j < hi)
                def _():
                    pltpu.make_async_copy(sX.at[jnp.int32(j)],
                                          out_ref.at[slot_ref[base + j]],
                                          semW.at[jnp.int32(j)]).wait()

    return kern


def make_schur_call(max_chunks: int, C: int, exact: bool,
                    interpret: bool = False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(max_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((C, BS, BS), jnp.float32)] * 3
        + [pltpu.SemaphoreType.DMA((C,))] * 4,
    )

    def call(pool, bounds, gl, gu, gt):
        return pl.pallas_call(
            _schur_kernel(C, exact),
            out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
            grid_spec=grid_spec,
            input_output_aliases={4: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(bounds, gl, gu, gt, pool)

    return call


def make_trsm_call(max_chunks: int, C: int, exact: bool, left: bool,
                   interpret: bool = False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(max_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((C, BS, BS), jnp.float32)] * 2
        + [pltpu.SemaphoreType.DMA((C,))] * 3,
    )

    def call(pool, dinv, bounds, slot, step):
        return pl.pallas_call(
            _trsm_kernel(C, exact, left),
            out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
            grid_spec=grid_spec,
            input_output_aliases={3: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(bounds, slot, step, pool, dinv)

    return call


# ---------------------------------------------------------------------------
# host tape preparation: window scheduling of the Schur tape
# ---------------------------------------------------------------------------


def _pack_windows(seg_t, C, min_dist=1):
    """Longest-remaining-first window packing: each window holds up to C
    entries with pairwise-distinct targets; with ``min_dist=2`` a target
    also never appears in two consecutive windows (required by the
    double-buffered kernel, which prefetches window w+1's targets before
    window w's writes complete). Returns (order, win_sizes).
    """
    n = len(seg_t)
    if n == 0:
        return np.empty(0, np.int64), []
    order0 = np.argsort(seg_t, kind="stable")
    st = seg_t[order0]
    bounds = np.flatnonzero(np.concatenate(([True], st[1:] != st[:-1])))
    bounds = np.concatenate((bounds, [n]))
    ngroups = len(bounds) - 1
    # per-group entry queues (positions into order0) + count buckets
    g_lo = bounds[:-1].copy()
    g_hi = bounds[1:]
    counts = (g_hi - g_lo).astype(np.int64)
    maxc = int(counts.max())
    buckets = [[] for _ in range(maxc + 1)]
    for g in range(ngroups):
        buckets[counts[g]].append(g)
    out = np.empty(n, dtype=np.int64)
    win_sizes = []
    pos = 0
    cur = maxc
    prev_taken: set = set()
    while pos < n:
        taken = []
        deferred = []
        c = cur
        while len(taken) < C and c > 0:
            b = buckets[c]
            while b and len(taken) < C:
                g = b.pop()
                if min_dist > 1 and g in prev_taken:
                    deferred.append((c, g))
                    continue
                out[pos] = order0[g_lo[g]]
                g_lo[g] += 1
                pos += 1
                taken.append(g)
            if not b:
                c -= 1
        for (c0, g) in deferred:      # excluded this window only
            buckets[c0].append(g)
        for g in taken:               # reinsert with decremented counts
            rem = int(g_hi[g] - g_lo[g])
            if rem > 0:
                buckets[rem].append(g)
        cur = maxc
        while cur > 0 and not buckets[cur]:
            cur -= 1
        prev_taken = set(taken)
        if not taken and pos < n:
            # every remaining target was in the previous window: emit an
            # empty spacer window
            prev_taken = set()
        win_sizes.append(len(taken))
    return out, win_sizes


def window_schedule(g_l, g_u, g_t, lptr, C, zero_slot, trash_slot,
                    min_dist=1):
    """Reorder each level's gemm segment so no DMA window of C lanes
    contains a duplicate target (and, with min_dist=2, no target repeats
    in adjacent windows — required by the pipelined kernel); partial
    windows pad with (zero,zero,trash) no-ops so the next window starts
    aligned. Returns new (g_l, g_u, g_t, lptr)."""
    g_l = np.asarray(g_l)
    g_u = np.asarray(g_u)
    g_t = np.asarray(g_t)
    out_l, out_u, out_t = [], [], []
    new_ptr = [0]
    nlvl = len(lptr) - 1
    fill_l = np.full(C, zero_slot, np.int32)
    fill_t = np.full(C, trash_slot, np.int32)
    total = 0
    for l in range(nlvl):
        lo, hi = int(lptr[l]), int(lptr[l + 1])
        if hi > lo:
            order, sizes = _pack_windows(g_t[lo:hi], C, min_dist=min_dist)
            consumed = 0
            for w, sz in enumerate(sizes):
                sel = order[consumed:consumed + sz]
                consumed += sz
                out_l.append(g_l[lo:hi][sel])
                out_u.append(g_u[lo:hi][sel])
                out_t.append(g_t[lo:hi][sel])
                total += sz
                pad = (C - sz) if w < len(sizes) - 1 else 0
                if pad:
                    out_l.append(fill_l[:pad])
                    out_u.append(fill_l[:pad])
                    out_t.append(fill_t[:pad])
                    total += pad
        new_ptr.append(total)
    if out_l:
        return (np.concatenate(out_l).astype(np.int32),
                np.concatenate(out_u).astype(np.int32),
                np.concatenate(out_t).astype(np.int32),
                np.asarray(new_ptr, np.int64))
    return (np.empty(0, np.int32), np.empty(0, np.int32),
            np.empty(0, np.int32), np.asarray(new_ptr, np.int64))


def pallas_factor_meta(plan: SymbolicPlan, C: int, min_dist: int = 1):
    """Window-scheduled, bucket-padded tapes + grid sizes for the hybrid
    executor. Returns (tapes_dict, consts_dict)."""
    assert plan.bs == BS, "the Pallas executor requires block size 128"
    lv = _bl.level_order(plan)
    gl, gu, gt, gptr = window_schedule(
        lv["g_l"], lv["g_u"], lv["g_t"], lv["gptr"], C,
        plan.zero_slot, plan.trash_slot, min_dist=min_dist)

    nlvlp = _bl.bucket125(plan.n_flevels)
    glen = _bl.bucket125(len(gl) + 1)
    llen = _bl.bucket125(len(lv["l_slot"]) + 1)
    ulen = _bl.bucket125(len(lv["u_slot"]) + 1)
    nbp = _bl.bucket125(plan.nb)

    def seg_max(ptr):
        d = np.diff(np.asarray(ptr))
        return int(d.max()) if len(d) else 1

    grid_g = max(1, -(-seg_max(gptr) // C))
    grid_l = max(1, -(-seg_max(lv["lptr"]) // C))
    grid_u = max(1, -(-seg_max(lv["uptr"]) // C))

    tapes = dict(
        dptr=_bl._pad_ptr(lv["dptr"], nlvlp),
        dstep=_bl._pad_to(lv["dstep"], _bl.bucket125(plan.nb + 1),
                          fill=nbp),
        dslot=_bl._pad_to(plan.diag_slot, nbp + 1, fill=plan.zero_slot),
        lptr=_bl._pad_ptr(lv["lptr"], nlvlp),
        l_slot=_bl._pad_to(lv["l_slot"], llen, fill=plan.trash_slot),
        l_step=_bl._pad_to(lv["l_step"], llen, fill=nbp),
        uptr=_bl._pad_ptr(lv["uptr"], nlvlp),
        u_slot=_bl._pad_to(lv["u_slot"], ulen, fill=plan.trash_slot),
        u_step=_bl._pad_to(lv["u_step"], ulen, fill=nbp),
        gptr=_bl._pad_ptr(gptr, nlvlp),
        g_l=_bl._pad_to(gl, glen, fill=plan.zero_slot),
        g_u=_bl._pad_to(gu, glen, fill=plan.zero_slot),
        g_t=_bl._pad_to(gt, glen, fill=plan.trash_slot),
    )
    consts = dict(nbp=nbp, nlvlp=nlvlp, grid_g=_bl.bucket125(grid_g, lo=1),
                  grid_l=_bl.bucket125(grid_l, lo=1),
                  grid_u=_bl.bucket125(grid_u, lo=1),
                  dlen=_bl.bucket125(plan.nb + 1),
                  poolp=_bl.bucket_fine(plan.nslots + 2))
    return tapes, consts


@functools.lru_cache(maxsize=32)
def _pallas_factor_executor(nbp, nlvlp, dlen, grid_g, grid_l, grid_u,
                            C, diag_chunk, exact, interpret,
                            pipelined=False):
    blu = jax.vmap(_bl.block_lu_inv, in_axes=(0, None))
    schur = (make_schur_call_db if pipelined else make_schur_call)(
        grid_g, C, exact, interpret)
    trsm_r = make_trsm_call(grid_l, C, exact, left=False,
                            interpret=interpret)
    trsm_l = make_trsm_call(grid_u, C, exact, left=True,
                            interpret=interpret)

    def factor(pool, thresh, tapes):
        dtype = pool.dtype

        def level(l, carry):
            pool, linv, uinv, tiny = carry

            lo, hi = tapes["dptr"][l], tapes["dptr"][l + 1]

            def diag(c, carry):
                pool, linv, uinv, tiny = carry
                offs, valid = _bl._chunk_indices(lo, hi, c, diag_chunk, dlen)
                steps = jnp.where(valid, tapes["dstep"][offs], nbp)
                dsl = tapes["dslot"][steps]
                LU, lk, uk, nt = blu(pool[dsl], thresh)
                # write back only valid lanes (masked lanes hit zero slot →
                # route their writes to the trash slot carried in dslot[nbp])
                wsl = jnp.where(valid, dsl, tapes["trash"])
                pool = pool.at[wsl].set(LU)
                linv = linv.at[steps].set(lk)
                uinv = uinv.at[steps].set(uk)
                tiny = tiny + jnp.sum(nt * valid).astype(jnp.int32)
                return pool, linv, uinv, tiny

            nch = (hi - lo + diag_chunk - 1) // diag_chunk
            pool, linv, uinv, tiny = lax.fori_loop(
                0, nch, diag, (pool, linv, uinv, tiny))

            lb = jnp.stack([tapes["lptr"][l], tapes["lptr"][l + 1]])
            pool = trsm_r(pool, uinv, lb, tapes["l_slot"], tapes["l_step"])
            ub = jnp.stack([tapes["uptr"][l], tapes["uptr"][l + 1]])
            pool = trsm_l(pool, linv, ub, tapes["u_slot"], tapes["u_step"])
            gb = jnp.stack([tapes["gptr"][l], tapes["gptr"][l + 1]])
            pool = schur(pool, gb, tapes["g_l"], tapes["g_u"], tapes["g_t"])
            return pool, linv, uinv, tiny

        linv0 = jnp.zeros((nbp + 1, BS, BS), dtype)
        uinv0 = jnp.zeros((nbp + 1, BS, BS), dtype)
        pool, linv, uinv, tiny = lax.fori_loop(
            0, nlvlp, level,
            (pool, linv0, uinv0, jnp.zeros((), jnp.int32)))
        return pool, linv, uinv, tiny

    return jax.jit(factor, donate_argnums=(0,))


def build_factor_fn_pallas(plan: SymbolicPlan, *, chunk: int = 16,
                           diag_chunk: int = 8, exact: bool = True,
                           interpret: bool = False, pipelined: bool = True):
    """Hybrid executor: XLA batched diagonal LU + Pallas TRSM/Schur phases.

    The double-buffered (distance-2) Schur kernel is the only supported
    variant: tightening the equivalence tests to per-block f64-ground-
    truth comparisons (round 2) exposed a lost contribution on shared
    root targets in the serial single-buffer kernel that the old
    10%-tolerance check had masked; the distance-2 kernel passes the
    tight test on the bushy fixture and randomized adversarial patterns.
    Returns (factor_fn, tapes) — tapes is a dict of device arrays expected
    by factor_fn(pool, thresh, tapes).
    """
    pipelined = True
    tapes, consts = pallas_factor_meta(plan, chunk,
                                       min_dist=2 if pipelined else 1)
    tapes = dict(tapes)
    tapes["trash"] = jnp.asarray(plan.trash_slot, jnp.int32)
    fn = _pallas_factor_executor(
        consts["nbp"], consts["nlvlp"], consts["dlen"], consts["grid_g"],
        consts["grid_l"], consts["grid_u"], chunk, diag_chunk, exact,
        interpret, pipelined)
    return fn, tapes


# ---------------------------------------------------------------------------
# Pallas solve sweeps: X[dst] -= pool[slot] @ X[src], then X[I] = Dinv[I] X[I]
# ---------------------------------------------------------------------------


def _solve_gemm_kernel(C, W, exact, transpose):
    def kern(bounds_ref, slot_ref, src_ref, dst_ref, pool_ref, x_ref,
             out_ref, sL, sS, sD, semL, semS, semD, semW):
        g = jnp.asarray(pl.program_id(0), jnp.int32)
        lo = jnp.asarray(bounds_ref[0], jnp.int32)
        hi = jnp.asarray(bounds_ref[1], jnp.int32)
        base = lo + g * jnp.int32(C)

        @pl.when(base < hi)
        def _step():

            for j in range(C):
                @pl.when(base + j < hi)
                def _():
                    pltpu.make_async_copy(pool_ref.at[slot_ref[base + j]],
                                          sL.at[jnp.int32(j)],
                                          semL.at[jnp.int32(j)]).start()
                    pltpu.make_async_copy(x_ref.at[src_ref[base + j]],
                                          sS.at[jnp.int32(j)],
                                          semS.at[jnp.int32(j)]).start()
                    pltpu.make_async_copy(out_ref.at[dst_ref[base + j]],
                                          sD.at[jnp.int32(j)],
                                          semD.at[jnp.int32(j)]).start()
            for j in range(C):
                @pl.when(base + j < hi)
                def _():
                    pltpu.make_async_copy(pool_ref.at[slot_ref[base + j]],
                                          sL.at[jnp.int32(j)],
                                          semL.at[jnp.int32(j)]).wait()
                    pltpu.make_async_copy(x_ref.at[src_ref[base + j]],
                                          sS.at[jnp.int32(j)],
                                          semS.at[jnp.int32(j)]).wait()
                    pltpu.make_async_copy(out_ref.at[dst_ref[base + j]],
                                          sD.at[jnp.int32(j)],
                                          semD.at[jnp.int32(j)]).wait()
                    L = sL[jnp.int32(j)]
                    if transpose:
                        L = L.T
                    sD[jnp.int32(j)] = sD[jnp.int32(j)] - _dot(
                        L, sS[jnp.int32(j)], exact)
                    pltpu.make_async_copy(sD.at[jnp.int32(j)],
                                          out_ref.at[dst_ref[base + j]],
                                          semW.at[jnp.int32(j)]).start()
            for j in range(C):
                @pl.when(base + j < hi)
                def _():
                    pltpu.make_async_copy(sD.at[jnp.int32(j)],
                                          out_ref.at[dst_ref[base + j]],
                                          semW.at[jnp.int32(j)]).wait()

    return kern


def make_solve_gemm_call(max_chunks: int, C: int, W: int, exact: bool,
                         transpose: bool = False, interpret: bool = False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(max_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((C, BS, BS), jnp.float32),
                        pltpu.VMEM((C, BS, W), jnp.float32),
                        pltpu.VMEM((C, BS, W), jnp.float32)]
        + [pltpu.SemaphoreType.DMA((C,))] * 4,
    )

    def call(pool, X, bounds, slot, src, dst):
        return pl.pallas_call(
            _solve_gemm_kernel(C, W, exact, transpose),
            out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
            grid_spec=grid_spec,
            input_output_aliases={5: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(bounds, slot, src, dst, pool, X)

    return call


def _diag_apply_kernel(C, W, exact, transpose):
    def kern(bounds_ref, row_ref, pool_unused_ref, dinv_ref, x_ref, out_ref,
             sX, sD, semX, semD, semW):
        g = jnp.asarray(pl.program_id(0), jnp.int32)
        lo = jnp.asarray(bounds_ref[0], jnp.int32)
        hi = jnp.asarray(bounds_ref[1], jnp.int32)
        base = lo + g * jnp.int32(C)

        @pl.when(base < hi)
        def _step():

            for j in range(C):
                @pl.when(base + j < hi)
                def _():
                    pltpu.make_async_copy(x_ref.at[row_ref[base + j]],
                                          sX.at[jnp.int32(j)],
                                          semX.at[jnp.int32(j)]).start()
                    pltpu.make_async_copy(dinv_ref.at[row_ref[base + j]],
                                          sD.at[jnp.int32(j)],
                                          semD.at[jnp.int32(j)]).start()
            for j in range(C):
                @pl.when(base + j < hi)
                def _():
                    pltpu.make_async_copy(x_ref.at[row_ref[base + j]],
                                          sX.at[jnp.int32(j)],
                                          semX.at[jnp.int32(j)]).wait()
                    pltpu.make_async_copy(dinv_ref.at[row_ref[base + j]],
                                          sD.at[jnp.int32(j)],
                                          semD.at[jnp.int32(j)]).wait()
                    D = sD[jnp.int32(j)]
                    if transpose:
                        D = D.T
                    sX[jnp.int32(j)] = _dot(D, sX[jnp.int32(j)], exact)
                    pltpu.make_async_copy(sX.at[jnp.int32(j)],
                                          out_ref.at[row_ref[base + j]],
                                          semW.at[jnp.int32(j)]).start()
            for j in range(C):
                @pl.when(base + j < hi)
                def _():
                    pltpu.make_async_copy(sX.at[jnp.int32(j)],
                                          out_ref.at[row_ref[base + j]],
                                          semW.at[jnp.int32(j)]).wait()

    return kern


def make_diag_apply_call(max_chunks: int, C: int, W: int, exact: bool,
                         transpose: bool = False, interpret: bool = False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((C, BS, W), jnp.float32),
                        pltpu.VMEM((C, BS, BS), jnp.float32)]
        + [pltpu.SemaphoreType.DMA((C,))] * 3,
    )

    def call(pool, dinv, X, bounds, rows):
        return pl.pallas_call(
            _diag_apply_kernel(C, W, exact, transpose),
            out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
            grid_spec=grid_spec,
            input_output_aliases={4: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(bounds, rows, pool, dinv, X)

    return call


def pallas_solve_meta(plan: SymbolicPlan, C: int):
    """Window-scheduled solve tapes for both sweeps."""
    nbp = _bl.bucket125(plan.nb)
    out = {}
    for name, gptr, gslot, gsrc, gdst, dptr, diag, nlvl in (
        ("l", plan.lsol_gptr, plan.lsol_gslot, plan.lsol_gsrc,
         plan.lsol_gdst, plan.lsol_dptr, plan.lsol_diag, plan.lsol_nlvl),
        ("u", plan.usol_gptr, plan.usol_gslot, plan.usol_gsrc,
         plan.usol_gdst, plan.usol_dptr, plan.usol_diag, plan.usol_nlvl),
    ):
        # reuse the factor window scheduler with (slot, src, dst) fields:
        # fillers read the pool zero block and hit the X trash row.
        gs, gr, gd, new_ptr = window_schedule(
            gslot, gsrc, gdst, gptr, C, plan.zero_slot, nbp)
        # fillers got src=zero_slot which may exceed X rows — remap to 0
        gr = np.where(gd == nbp, 0, gr).astype(np.int32)
        nlvlp = _bl.bucket125(nlvl)
        glen = _bl.bucket125(len(gs) + 1)
        dlen = _bl.bucket125(len(diag) + 1)
        seg = np.diff(new_ptr)
        grid_g = max(1, -(-int(seg.max(initial=1)) // C))
        segd = np.diff(dptr)
        grid_d = max(1, -(-int(segd.max(initial=1)) // C))
        out[name] = dict(
            gptr=_bl._pad_ptr(new_ptr, nlvlp),
            gslot=_bl._pad_to(gs, glen, fill=plan.zero_slot),
            gsrc=_bl._pad_to(gr, glen, fill=0),
            gdst=_bl._pad_to(gd, glen, fill=nbp),
            dptr=_bl._pad_ptr(dptr, nlvlp),
            diag=_bl._pad_to(diag, dlen, fill=nbp),
            nlvl=nlvl, nlvlp=nlvlp,
            grid_g=_bl.bucket125(grid_g, lo=1),
            grid_d=_bl.bucket125(grid_d, lo=1),
        )
    return out, nbp


@functools.lru_cache(maxsize=32)
def _pallas_solve_executor(nbp, key_l, key_u, C, W, exact, interpret):
    (nlvlp_l, grid_gl, grid_dl) = key_l
    (nlvlp_u, grid_gu, grid_du) = key_u
    g_l = make_solve_gemm_call(grid_gl, C, W, exact, interpret=interpret)
    d_l = make_diag_apply_call(grid_dl, C, W, exact, interpret=interpret)
    g_u = make_solve_gemm_call(grid_gu, C, W, exact, interpret=interpret)
    d_u = make_diag_apply_call(grid_du, C, W, exact, interpret=interpret)

    def sweep(pool, dinv, X, t, nlvlp, gcall, dcall):
        def level(l, X):
            gb = jnp.stack([t["gptr"][l], t["gptr"][l + 1]])
            X = gcall(pool, X, gb, t["gslot"], t["gsrc"], t["gdst"])
            db = jnp.stack([t["dptr"][l], t["dptr"][l + 1]])
            return dcall(pool, dinv, X, db, t["diag"])

        return lax.fori_loop(0, nlvlp, level, X)

    def solve(pool, linv, uinv, tl, tu, b):
        X = b.reshape(nbp, BS, W)
        X = jnp.concatenate([X, jnp.zeros((1, BS, W), X.dtype)], axis=0)
        X = sweep(pool, linv, X, tl, nlvlp_l, g_l, d_l)
        X = sweep(pool, uinv, X, tu, nlvlp_u, g_u, d_u)
        return X[:nbp].reshape(nbp * BS, W)

    return jax.jit(solve)


def build_solve_fn_pallas(plan: SymbolicPlan, nrhs: int, *, chunk: int = 16,
                          exact: bool = True, interpret: bool = False):
    """Pallas level-set solve. b must be (nbp*128, W) with W = nrhs padded
    to a multiple of 128 (DMA alignment). Returns (solve_fn, (tl, tu), W).
    """
    assert plan.bs == BS
    W = max(128, -(-nrhs // 128) * 128)
    meta, nbp = pallas_solve_meta(plan, chunk)
    tl, tu = meta["l"], meta["u"]
    key_l = (tl["nlvlp"], tl["grid_g"], tl["grid_d"])
    key_u = (tu["nlvlp"], tu["grid_g"], tu["grid_d"])
    fn = _pallas_solve_executor(nbp, key_l, key_u, chunk, W, exact,
                                interpret)
    return fn, (tl, tu), W


# ---------------------------------------------------------------------------
# whole-sweep solve kernel: one pallas call per triangular sweep
# ---------------------------------------------------------------------------
#
# The per-call overhead of a pallas_call inside a compiled program is
# ~0.2-0.5ms on this target; a level-by-level sweep (2 calls x nlvl) is
# call-bound. This kernel walks the ENTIRE sweep in one sequential grid:
# each grid step is one DMA window tagged with an opcode
# (0 = X[dst] -= pool[slot] @ X[src], 1 = X[row] = dinv[row] @ X[row],
# 2 = no-op padding), in level order — sequential TPU grid steps preserve
# the level dependencies.


def _sweep_kernel(C, W, exact):
    def kern(op_ref, ta_ref, tb_ref, tc_ref, pool_ref, dinv_ref, x_ref,
             out_ref, sL, sS, sD, semL, semS, semD, semW):
        g = jnp.asarray(pl.program_id(0), jnp.int32)
        base = g * jnp.int32(C)
        op = op_ref[g]

        @pl.when(op == 0)
        def _gemm():
            for j in range(C):
                @pl.when(tc_ref[base + j] >= 0)
                def _():
                    pltpu.make_async_copy(pool_ref.at[ta_ref[base + j]],
                                          sL.at[jnp.int32(j)],
                                          semL.at[jnp.int32(j)]).start()
                    pltpu.make_async_copy(out_ref.at[tb_ref[base + j]],
                                          sS.at[jnp.int32(j)],
                                          semS.at[jnp.int32(j)]).start()
                    pltpu.make_async_copy(out_ref.at[tc_ref[base + j]],
                                          sD.at[jnp.int32(j)],
                                          semD.at[jnp.int32(j)]).start()
            for j in range(C):
                @pl.when(tc_ref[base + j] >= 0)
                def _():
                    pltpu.make_async_copy(pool_ref.at[ta_ref[base + j]],
                                          sL.at[jnp.int32(j)],
                                          semL.at[jnp.int32(j)]).wait()
                    pltpu.make_async_copy(out_ref.at[tb_ref[base + j]],
                                          sS.at[jnp.int32(j)],
                                          semS.at[jnp.int32(j)]).wait()
                    pltpu.make_async_copy(out_ref.at[tc_ref[base + j]],
                                          sD.at[jnp.int32(j)],
                                          semD.at[jnp.int32(j)]).wait()
                    sD[jnp.int32(j)] = sD[jnp.int32(j)] - _dot(
                        sL[jnp.int32(j)], sS[jnp.int32(j)], exact)
                    pltpu.make_async_copy(sD.at[jnp.int32(j)],
                                          out_ref.at[tc_ref[base + j]],
                                          semW.at[jnp.int32(j)]).start()
            for j in range(C):
                @pl.when(tc_ref[base + j] >= 0)
                def _():
                    pltpu.make_async_copy(sD.at[jnp.int32(j)],
                                          out_ref.at[tc_ref[base + j]],
                                          semW.at[jnp.int32(j)]).wait()

        @pl.when(op == 1)
        def _diag():
            for j in range(C):
                @pl.when(tc_ref[base + j] >= 0)
                def _():
                    pltpu.make_async_copy(out_ref.at[tc_ref[base + j]],
                                          sS.at[jnp.int32(j)],
                                          semS.at[jnp.int32(j)]).start()
                    pltpu.make_async_copy(dinv_ref.at[ta_ref[base + j]],
                                          sL.at[jnp.int32(j)],
                                          semL.at[jnp.int32(j)]).start()
            for j in range(C):
                @pl.when(tc_ref[base + j] >= 0)
                def _():
                    pltpu.make_async_copy(out_ref.at[tc_ref[base + j]],
                                          sS.at[jnp.int32(j)],
                                          semS.at[jnp.int32(j)]).wait()
                    pltpu.make_async_copy(dinv_ref.at[ta_ref[base + j]],
                                          sL.at[jnp.int32(j)],
                                          semL.at[jnp.int32(j)]).wait()
                    sD[jnp.int32(j)] = _dot(sL[jnp.int32(j)],
                                            sS[jnp.int32(j)], exact)
                    pltpu.make_async_copy(sD.at[jnp.int32(j)],
                                          out_ref.at[tc_ref[base + j]],
                                          semW.at[jnp.int32(j)]).start()
            for j in range(C):
                @pl.when(tc_ref[base + j] >= 0)
                def _():
                    pltpu.make_async_copy(sD.at[jnp.int32(j)],
                                          out_ref.at[tc_ref[base + j]],
                                          semW.at[jnp.int32(j)]).wait()

    return kern


def make_sweep_call(n_windows: int, C: int, W: int, exact: bool,
                    interpret: bool = False, bs: int = BS):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_windows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((C, bs, bs), jnp.float32),
                        pltpu.VMEM((C, bs, W), jnp.float32),
                        pltpu.VMEM((C, bs, W), jnp.float32)]
        + [pltpu.SemaphoreType.DMA((C,))] * 4,
    )

    def call(pool, dinv, X, op, ta, tb, tc):
        return pl.pallas_call(
            _sweep_kernel(C, W, exact),
            out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
            grid_spec=grid_spec,
            input_output_aliases={6: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(op, ta, tb, tc, pool, dinv, X)

    return call


def sweep_tape(plan: SymbolicPlan, which: str, C: int):
    """Whole-sweep window tape: per level, round-scheduled gemm windows
    (no duplicate destination within a window) then the diagonal
    applications. Lane sentinel: tc = -1 skips the lane.
    Returns (op (nw,), ta, tb, tc (nw*C,), n_windows)."""
    if which == "L":
        gptr, gslot, gsrc, gdst = (plan.lsol_gptr, plan.lsol_gslot,
                                   plan.lsol_gsrc, plan.lsol_gdst)
        dptr, diag, nlvl = plan.lsol_dptr, plan.lsol_diag, plan.lsol_nlvl
    else:
        gptr, gslot, gsrc, gdst = (plan.usol_gptr, plan.usol_gslot,
                                   plan.usol_gsrc, plan.usol_gdst)
        dptr, diag, nlvl = plan.usol_dptr, plan.usol_diag, plan.usol_nlvl
    gslot = np.asarray(gslot)
    gsrc = np.asarray(gsrc)
    gdst = np.asarray(gdst)
    diag = np.asarray(diag)

    ops = []
    A_, B_, Cc = [], [], []

    def emit_windows(op, a, b, c):
        """Pack (a,b,c) lane arrays into op-tagged windows of C."""
        m = len(a)
        nwin = -(-m // C) if m else 0
        pad = nwin * C - m
        if pad:
            a = np.concatenate([a, np.zeros(pad, np.int32)])
            b = np.concatenate([b, np.zeros(pad, np.int32)])
            c = np.concatenate([c, np.full(pad, -1, np.int32)])
        ops.extend([op] * nwin)
        A_.append(a.astype(np.int32))
        B_.append(b.astype(np.int32))
        Cc.append(c.astype(np.int32))

    for l in range(nlvl):
        lo, hi = int(gptr[l]), int(gptr[l + 1])
        if hi > lo:
            seg_t = gdst[lo:hi]
            order, sizes = _pack_windows(seg_t, C)
            consumed = 0
            for sz in sizes:
                sel = order[consumed:consumed + sz]
                consumed += sz
                emit_windows(0, gslot[lo:hi][sel], gsrc[lo:hi][sel],
                             seg_t[sel])
        dl = diag[dptr[l]:dptr[l + 1]].astype(np.int32)
        if len(dl):
            emit_windows(1, dl, np.zeros(len(dl), np.int32), dl)

    nw = len(ops)
    nwp = _bl.bucket125(nw, lo=1)
    if nwp > nw:
        emit_windows(2, np.zeros((nwp - nw) * C, np.int32),
                     np.zeros((nwp - nw) * C, np.int32),
                     np.full((nwp - nw) * C, -1, np.int32))
        ops = ops[: nw] + [2] * (nwp - nw)
    op_arr = np.asarray(ops, np.int32)
    la = np.concatenate(A_) if A_ else np.empty(0, np.int32)
    lb = np.concatenate(B_) if B_ else np.empty(0, np.int32)
    lanes = np.concatenate(Cc) if Cc else np.empty(0, np.int32)
    assert len(la) == nwp * C, (len(la), nwp, C)
    return (jnp.asarray(op_arr), jnp.asarray(la), jnp.asarray(lb),
            jnp.asarray(lanes), nwp)


#: windows per solve-kernel segment: one segment's scalar-prefetch tapes
#: ((1 + 3·C) int32 per window) must fit SMEM. Beyond this the window
#: stream is cut into uniform segments scanned by ONE compiled pallas
#: call — the grid is sequential, so a cut anywhere preserves the level
#: order (no state crosses windows except X, which is aliased through).
SOLVE_SEG_WINDOWS = 2048


def _segment_sweep_tape(tape, C):
    """Split one sweep's (op, ta, tb, tc) into uniform SOLVE_SEG_WINDOWS
    segments, padded with op=2 / lane=-1 no-op windows; returns stacked
    (nseg, ...) device arrays."""
    op, ta, tb, tc = (np.asarray(t) for t in tape)
    segw = SOLVE_SEG_WINDOWS
    nseg = max(1, -(-len(op) // segw))
    pad = nseg * segw - len(op)
    if pad:
        op = np.concatenate([op, np.full(pad, 2, op.dtype)])
        ta = np.concatenate([ta, np.zeros(pad * C, ta.dtype)])
        tb = np.concatenate([tb, np.zeros(pad * C, tb.dtype)])
        tc = np.concatenate([tc, np.full(pad * C, -1, tc.dtype)])
    return (jnp.asarray(op.reshape(nseg, segw)),
            jnp.asarray(ta.reshape(nseg, segw * C)),
            jnp.asarray(tb.reshape(nseg, segw * C)),
            jnp.asarray(tc.reshape(nseg, segw * C)))


@functools.lru_cache(maxsize=32)
def _fused_solve_executor(nbp, nw_l, nw_u, C, W, exact, interpret, bs=BS):
    from jax import lax
    seg_l = nw_l > SOLVE_SEG_WINDOWS
    seg_u = nw_u > SOLVE_SEG_WINDOWS
    sweep_l = make_sweep_call(SOLVE_SEG_WINDOWS if seg_l else nw_l, C, W,
                              exact, interpret, bs)
    sweep_u = make_sweep_call(SOLVE_SEG_WINDOWS if seg_u else nw_u, C, W,
                              exact, interpret, bs)

    def run(sweep, segmented, pool, dinv, X, tape):
        if not segmented:
            return sweep(pool, dinv, X, *tape)

        def body(X, tp):
            return sweep(pool, dinv, X, *tp), None

        X, _ = lax.scan(body, X, tape)
        return X

    def solve(pool, linv, uinv, tl, tu, b):
        X = b.reshape(nbp, bs, W)
        X = jnp.concatenate([X, jnp.zeros((1, bs, W), X.dtype)], axis=0)
        X = run(sweep_l, seg_l, pool, linv, X, tl)
        X = run(sweep_u, seg_u, pool, uinv, X, tu)
        return X[:nbp].reshape(nbp * bs, W)

    return jax.jit(solve)


def build_solve_fn_pallas_fused(plan: SymbolicPlan, nrhs: int, *,
                                chunk: int = 16, exact: bool = True,
                                interpret: bool = False):
    """One pallas call per triangular sweep (segment-scanned when the
    window tape exceeds SMEM). Same contract as build_solve_fn_pallas:
    returns (solve_fn, (tl, tu), W)."""
    assert plan.bs % 8 == 0
    W = max(128, -(-nrhs // 128) * 128)
    opl, tal, tbl, tcl, nwl = sweep_tape(plan, "L", chunk)
    opu, tau, tbu, tcu, nwu = sweep_tape(plan, "U", chunk)
    nbp = _bl.bucket125(plan.nb)
    tl = ((opl, tal, tbl, tcl) if nwl <= SOLVE_SEG_WINDOWS
          else _segment_sweep_tape((opl, tal, tbl, tcl), chunk))
    tu = ((opu, tau, tbu, tcu) if nwu <= SOLVE_SEG_WINDOWS
          else _segment_sweep_tape((opu, tau, tbu, tcu), chunk))
    fn = _fused_solve_executor(nbp, nwl, nwu, chunk, W, exact, interpret,
                               plan.bs)
    return fn, (tl, tu), W


# ---------------------------------------------------------------------------
# double-buffered Schur kernel: prefetch window w+1 while computing w
# ---------------------------------------------------------------------------
#
# Requires distance-2 window packing (a target never appears in adjacent
# windows), so window w+1's target prefetch cannot race window w's
# write-back; window w-1's writes are waited before issuing w+1's reads.
# The grid runs one extra (inactive) step so the final window's writes are
# always waited inside the kernel.


def _schur_kernel_db(C, exact):
    def kern(bounds_ref, gl_ref, gu_ref, gt_ref, pool_ref, out_ref,
             sL, sU, sT, semL, semU, semT, semW):
        g = jnp.asarray(pl.program_id(0), jnp.int32)
        lo = jnp.asarray(bounds_ref[0], jnp.int32)
        hi = jnp.asarray(bounds_ref[1], jnp.int32)
        base = lo + g * jnp.int32(C)
        two = jnp.int32(2)
        bank = jax.lax.rem(g, two)
        nbank = jax.lax.rem(g + jnp.int32(1), two)
        pbank = nbank  # (g-1) % 2 == (g+1) % 2

        def reads(b0, bk):
            for j in range(C):
                @pl.when(b0 + j < hi)
                def _():
                    pltpu.make_async_copy(pool_ref.at[gl_ref[b0 + j]],
                                          sL.at[bk, jnp.int32(j)],
                                          semL.at[bk, jnp.int32(j)]).start()
                    pltpu.make_async_copy(pool_ref.at[gu_ref[b0 + j]],
                                          sU.at[bk, jnp.int32(j)],
                                          semU.at[bk, jnp.int32(j)]).start()
                    pltpu.make_async_copy(out_ref.at[gt_ref[b0 + j]],
                                          sT.at[bk, jnp.int32(j)],
                                          semT.at[bk, jnp.int32(j)]).start()

        # wait the previous window's write-backs (outside the active guard:
        # the step after the last active window still executes this)
        pbase = base - jnp.int32(C)

        @pl.when((g > 0) & (pbase < hi))
        def _():
            for j in range(C):
                @pl.when(pbase + j < hi)
                def _():
                    pltpu.make_async_copy(
                        sT.at[pbank, jnp.int32(j)],
                        out_ref.at[gt_ref[pbase + j]],
                        semW.at[pbank, jnp.int32(j)]).wait()

        @pl.when(base < hi)
        def _active():
            @pl.when(g == 0)
            def _():
                reads(base, bank)
            # prefetch the next window
            reads(base + jnp.int32(C), nbank)
            # wait this window's reads, compute, write back
            for j in range(C):
                @pl.when(base + j < hi)
                def _():
                    pltpu.make_async_copy(pool_ref.at[gl_ref[base + j]],
                                          sL.at[bank, jnp.int32(j)],
                                          semL.at[bank, jnp.int32(j)]).wait()
                    pltpu.make_async_copy(pool_ref.at[gu_ref[base + j]],
                                          sU.at[bank, jnp.int32(j)],
                                          semU.at[bank, jnp.int32(j)]).wait()
                    pltpu.make_async_copy(out_ref.at[gt_ref[base + j]],
                                          sT.at[bank, jnp.int32(j)],
                                          semT.at[bank, jnp.int32(j)]).wait()
                    sT[bank, jnp.int32(j)] = sT[bank, jnp.int32(j)] - _dot(
                        sL[bank, jnp.int32(j)], sU[bank, jnp.int32(j)],
                        exact)
                    pltpu.make_async_copy(sT.at[bank, jnp.int32(j)],
                                          out_ref.at[gt_ref[base + j]],
                                          semW.at[bank, jnp.int32(j)]).start()

    return kern


def make_schur_call_db(max_chunks: int, C: int, exact: bool,
                       interpret: bool = False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(max_chunks + 1,),   # +1: trailing step waits final writes
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((2, C, BS, BS), jnp.float32)] * 3
        + [pltpu.SemaphoreType.DMA((2, C))] * 4,
    )

    def call(pool, bounds, gl, gu, gt):
        return pl.pallas_call(
            _schur_kernel_db(C, exact),
            out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
            grid_spec=grid_spec,
            input_output_aliases={4: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(bounds, gl, gu, gt, pool)

    return call
