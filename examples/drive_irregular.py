"""Irregular (SuiteSparse-class) matrices through the full expert driver.

The reference's acceptance diet is irregular HB/MM matrices
(reference: EXAMPLE/dcreate_matrix.c:1-235, TEST/pdtest.c:107-563). This
example runs the synthetic analogs spanning those classes — 3D FEM
elasticity, 2D FEM mesh, circuit with hub rails, KKT saddle-point with a
zero (2,2) block, anisotropic grid — through equil → MC64 → ordering →
factor → solve → f64-residual refinement, and prints the adaptive plan
policy's decisions (stat.counters[adapt_*]).

Run:  python examples/drive_irregular.py [small]
"""

import sys

import numpy as np

from superlu_dist_tpu import Options, gssvx
from superlu_dist_tpu.utils.testing import (aniso2d, circuit_graph,
                                            fem2d_delaunay, fem3d_delaunay,
                                            kkt_system)


def main(small: bool = False):
    f = 0.1 if small else 1.0
    cases = {
        "fem3d": fem3d_delaunay(int(10_000 * f) or 300, seed=1, dof=3),
        "fem2d": fem2d_delaunay(int(80_000 * f) or 1000, seed=2),
        "circuit": circuit_graph(int(100_000 * f) or 1500, seed=3),
        "kkt": kkt_system(int(40_000 * f) or 900, seed=4),
        "aniso2d": aniso2d(int(200 * max(f, 0.2))),
    }
    for name, A in cases.items():
        n = A.shape[0]
        rng = np.random.default_rng(0)
        xt = rng.standard_normal(n)
        b = np.asarray(A @ xt)
        res, lu = gssvx(A, b, Options(dtype="float32", block_size=128))
        rel = float(np.abs(res.x - xt).max() / np.abs(xt).max())
        adapt = {k: v for k, v in lu.stat.counters.items()
                 if k.startswith("adapt")}
        print(f"[{name}] n={n} nnz={A.nnz} berr={res.berr.max():.1e} "
              f"relerr={rel:.1e} prec={lu.stat.counters.get('gemm_precision')}"
              f" adapt={adapt or 'not triggered'}")


if __name__ == "__main__":
    main(small="small" in sys.argv[1:])
