"""Ordering quality: multilevel ND, geometric ND, fill regression gates.

VERDICT round-1 item 9 asked for a fill-quality regression test comparing
orderings on fixed fixtures so ordering regressions are caught.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from superlu_dist_tpu.ops.host.mlnd import (multilevel_edge_bisect,
                                            nested_dissection_ml,
                                            _vertex_separator,
                                            _cut_and_balance)
from superlu_dist_tpu.ops.host.ordering import (geometric_nd,
                                                nested_dissection,
                                                _sym_pattern_at_plus_a)
from superlu_dist_tpu.utils.testing import laplacian_2d, laplacian_3d


def scalar_lu_flops(A3):
    lu = spla.splu(sp.csc_matrix(A3).astype(np.float64),
                   permc_spec="NATURAL", diag_pivot_thresh=0.0,
                   options=dict(SymmetricMode=False))
    L, U = lu.L.tocsc(), lu.U.tocsr()
    nnzL = np.diff(L.indptr) - 1
    nnzU = np.diff(U.indptr)
    return float(np.sum(nnzL) + np.sum(2.0 * nnzL * nnzU))


def block_model_flops(A3, bs=64):
    """Dense-block flop model (what the device executes)."""
    n = A3.shape[0]
    nb = -(-n // bs)
    coo = A3.tocoo()
    Ls = [set() for _ in range(nb)]
    Us = [set() for _ in range(nb)]
    for i, j in set(zip((coo.row // bs).tolist(), (coo.col // bs).tolist())):
        if i > j:
            Ls[j].add(i)
        elif i < j:
            Us[i].add(j)
    flops = 0.0
    for k in range(nb):
        rows, cols = sorted(Ls[k]), sorted(Us[k])
        m, nn = len(rows), len(cols)
        flops += (2 / 3 + m + nn + 2.0 * m * nn) * bs**3
        for J in cols:
            for I in rows:
                if I > J:
                    Ls[J].add(I)
                elif I < J:
                    Us[I].add(J)
    return flops


def test_bisection_quality_grid():
    """Multilevel bisection of a 16x16x16 grid: balanced, small separator."""
    G = sp.csr_matrix(_sym_pattern_at_plus_a(laplacian_3d(16)))
    G.data = np.ones_like(G.data, dtype=np.float64)
    rng = np.random.default_rng(0)
    side = multilevel_edge_bisect(G, rng)
    cut, bal = _cut_and_balance(G, np.ones(G.shape[0]), side)
    sep = _vertex_separator(G, side)
    assert 0.42 <= bal <= 0.58
    # ideal separator is a 16x16 plane = 256; allow 2x slack
    assert len(sep) <= 512


def test_vertex_separator_separates():
    G = sp.csr_matrix(_sym_pattern_at_plus_a(laplacian_2d(12)))
    G.data = np.ones_like(G.data, dtype=np.float64)
    rng = np.random.default_rng(1)
    side = multilevel_edge_bisect(G, rng)
    sep = _vertex_separator(G, side)
    keep = np.ones(G.shape[0], dtype=bool)
    keep[sep] = False
    sub = G[keep][:, keep]
    ncomp, labels = sp.csgraph.connected_components(sub, directed=False)
    # no edge between the two sides once the separator is removed
    sides = side[keep]
    for c in range(ncomp):
        vals = np.unique(sides[labels == c])
        assert len(vals) == 1, "separator does not separate"


def test_mlnd_is_valid_permutation():
    G = _sym_pattern_at_plus_a(laplacian_3d(10))
    perm = nested_dissection_ml(G)
    assert len(np.unique(perm)) == G.shape[0]


def test_mlnd_fill_not_catastrophic():
    """mlND fill within 3x of the BFS-ND baseline on a fixed fixture."""
    A = laplacian_3d(12)
    G = _sym_pattern_at_plus_a(A)
    p_ml = nested_dissection_ml(G)
    p_bfs = nested_dissection(sp.csr_matrix(G))
    f_ml = scalar_lu_flops(A[p_ml][:, p_ml])
    f_bfs = scalar_lu_flops(A[p_bfs][:, p_bfs])
    assert f_ml <= 3.0 * f_bfs


def test_geometric_nd_block_density():
    """Geometric ND produces far denser blocks than natural order, and
    beats BFS-ND on executed (block-model) flops on a 3D grid."""
    A = laplacian_3d(16)
    pg = geometric_nd((16, 16, 16))
    Ag = A[pg][:, pg]
    p_bfs = nested_dissection(sp.csr_matrix(_sym_pattern_at_plus_a(A)))
    Ab = A[p_bfs][:, p_bfs]
    mg = block_model_flops(Ag, bs=64)
    mb = block_model_flops(Ab, bs=64)
    assert mg < mb, (mg, mb)


def test_geometric_nd_solve_end_to_end():
    """geometric_nd through the public driver via MY_PERMC/user_colperm."""
    from superlu_dist_tpu import Options, SparseLU
    from superlu_dist_tpu.utils.options import ColPerm
    A = laplacian_3d(8)
    n = A.shape[0]
    lu = SparseLU(A, Options(dtype="float64", block_size=16,
                             col_perm=ColPerm.MY_PERMC,
                             user_colperm=geometric_nd((8, 8, 8))))
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n)
    x = lu.solve(np.asarray(A @ xt))
    assert np.abs(x - xt).max() < 1e-9


def test_native_nd_valid_and_quality():
    """C++ multilevel ND: valid permutation, fill within 1.5x of the
    Python mlND on fixed fixtures (same algorithm family, different RNG),
    and never catastrophically worse than AMD."""
    from superlu_dist_tpu.ops.host.native import (get_lib,
                                                  native_min_degree,
                                                  native_nested_dissection)
    if get_lib() is None:
        pytest.skip("native engine unavailable")
    for A in (laplacian_3d(12), laplacian_2d(40)):
        A = sp.csr_matrix(A)
        G = _sym_pattern_at_plus_a(A)
        p = native_nested_dissection(G.indptr, G.indices)
        assert p is not None
        assert len(np.unique(p)) == A.shape[0]
        f_nd = scalar_lu_flops(A[p][:, p])
        p_ml = nested_dissection_ml(G)
        f_ml = scalar_lu_flops(A[p_ml][:, p_ml])
        p_amd = native_min_degree(G.indptr, G.indices)
        f_amd = scalar_lu_flops(A[p_amd][:, p_amd])
        assert f_nd <= 1.5 * f_ml
        assert f_nd <= 3.0 * f_amd
