"""Does a 2D (poolp, bs*bs) output kill the factor's exit-copy?

The fused init+factor program with a 3D output pays a full-pool exit
copy (temp = 2x pool): XLA's internal carry layout != the default 3D
boundary layout. A 2D output's canonical {1,0} layout is
bitcast-compatible with a row-major 3D carry, so constraint propagation
should make the whole chain row-major and copy-free. Verify, then check
fetch + a reshape-consuming solve-style jit.
"""
import os, sys, time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from superlu_dist_tpu.ops.host import align as _align
from superlu_dist_tpu.ops.host.ordering import geometric_nd
from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.ops.kernels import blocklu
from superlu_dist_tpu.utils.testing import laplacian_3d


def main(nx=32, bs=64, chunk=64):
    A = laplacian_3d(nx).tocsc()
    perm = geometric_nd((nx, nx, nx))
    A3 = A[perm, :][:, perm]
    res = _align.aligned_blocking(A3, bs, max_inflate=1.5)
    if res is not None:
        A3 = A3[res.po, :][:, res.po]
        A3 = _align.expand_matrix(A3, res.expand, res.n_e)
    plan = block_symbolic(A3, bs)
    tapes = blocklu.make_factor_tapes(plan)
    triple = blocklu.staged_values(plan, A3.data, np.float32)
    b = blocklu.factor_buckets(plan)
    core = blocklu.build_factor_core(plan, chunk=chunk)

    def fused2d(slot, off, vals, thresh, tapes):
        flat = jnp.zeros((b.poolp, bs * bs), vals.dtype)
        flat = flat.at[slot, off].add(vals)
        pool, linv, uinv, tiny = core(flat.reshape(b.poolp, bs, bs),
                                      thresh, tapes)
        return (pool.reshape(b.poolp, bs * bs),
                linv.reshape(-1, bs * bs), uinv.reshape(-1, bs * bs), tiny)

    fn = jax.jit(fused2d)
    t0 = time.time()
    comp = fn.lower(*triple, jnp.float32(1e-6), tapes).compile()
    print("compile", round(time.time() - t0, 1), flush=True)
    ma = comp.memory_analysis()
    print("pool bytes:", b.poolp * bs * bs * 4, "temp:",
          ma.temp_size_in_bytes, "out:", ma.output_size_in_bytes, flush=True)
    out = fn(*triple, jnp.float32(1e-6), tapes)
    p2 = out[0]
    print("out fmt:", p2.format.layout.major_to_minor, flush=True)
    t0 = time.time()
    s = float(np.asarray(p2[:4]).sum())
    print("slice fetch ok", round(time.time() - t0, 1), s, flush=True)

    # solve-style consumer: reshape to 3D inside the jit
    g = jax.jit(lambda p, i: jnp.einsum(
        "cij,cjk->cik", p.reshape(b.poolp, bs, bs)[i],
        p.reshape(b.poolp, bs, bs)[i]).sum())
    cg = g.lower(p2, jnp.arange(8, dtype=jnp.int32)).compile()
    mg = cg.memory_analysis()
    print("consumer temp:", mg.temp_size_in_bytes, flush=True)
    print("consume:", float(g(p2, jnp.arange(8, dtype=jnp.int32))), flush=True)

    # correctness vs the pool-path executor on CPU-built reference
    pool = blocklu.init_pool(plan, A3.data, np.float32)
    ref = blocklu.build_factor_fn(plan, chunk=chunk)(
        pool, jnp.float32(1e-6), tapes)
    d = np.abs(np.asarray(ref[0]).reshape(b.poolp, bs * bs) -
               np.asarray(p2)).max()
    print("max |2d - ref|:", d, flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]) if len(sys.argv) > 1 else ())
