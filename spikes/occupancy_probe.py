"""Per-block scalar occupancy: how full are the stored B x B blocks?

Compares the dense-block pool bytes against the exact scalar LU fill of
the SAME permuted/expanded matrix (splu NATURAL = the fill the block GE
bounds). Tells us the ceiling for any sub-block storage scheme, and the
shape of the occupancy distribution (bimodal -> two-tier pays; flat ->
only bs reduction pays).
"""
import sys
import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

sys.path.insert(0, "/root/repo")

from superlu_dist_tpu.ops.host import align as _align
from superlu_dist_tpu.ops.host.ordering import geometric_nd
from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.utils.testing import laplacian_3d


def probe(nx: int, bs: int):
    n = nx ** 3
    A = laplacian_3d(nx).tocsc()
    perm = geometric_nd((nx, nx, nx))
    A3 = A[perm, :][:, perm]
    res = _align.aligned_blocking(A3, bs, max_inflate=1.5)
    if res is not None:
        A3 = A3[res.po, :][:, res.po]
        A3 = _align.expand_matrix(A3, res.expand, res.n_e)
    plan = block_symbolic(A3, bs)

    t0 = time.time()
    lu = spla.splu(A3.astype(np.float64), permc_spec="NATURAL",
                   diag_pivot_thresh=0.0, options=dict(SymmetricMode=False))
    t_splu = time.time() - t0
    L = lu.L.tocoo()
    U = lu.U.tocoo()
    rows = np.concatenate([L.row, U.row])
    cols = np.concatenate([L.col, U.col])
    # per-slot scalar nnz
    key = (rows // bs).astype(np.int64) * plan.nb + (cols // bs)
    slot_key = plan.slot_row * plan.nb + plan.slot_col
    order = np.argsort(slot_key)
    uk, counts = np.unique(key, return_counts=True)
    occ = np.zeros(plan.nslots, dtype=np.int64)
    pos = np.searchsorted(slot_key[order], uk)
    hit = slot_key[order][pos.clip(max=plan.nslots - 1)] == uk
    occ[order[pos[hit]]] = counts[hit]
    frac = occ / (bs * bs)

    scalar_nnz = int(L.nnz + U.nnz)
    pool_entries = plan.nslots * bs * bs
    print(f"nx={nx} bs={bs}: slots={plan.nslots} pool_entries={pool_entries/1e6:.0f}M "
          f"scalar_nnz={scalar_nnz/1e6:.0f}M  byte_pad={pool_entries/scalar_nnz:.2f}x "
          f"[splu {t_splu:.0f}s]")
    qs = [0, 10, 25, 50, 75, 90, 100]
    print("  occ pct:", {q: round(float(np.percentile(frac, q)), 3) for q in qs})
    # bytes by occupancy bucket
    for lo, hi in [(0, .1), (.1, .25), (.25, .5), (.5, .75), (.75, 1.01)]:
        m = (frac >= lo) & (frac < hi)
        print(f"  occ [{lo:.2f},{hi:.2f}): {m.sum():6d} slots "
              f"{m.sum()*bs*bs*4/2**30:.2f} GiB "
              f"(useful {occ[m].sum()*4/2**30:.2f} GiB)")
    # row/col band trimming potential: bytes if each block stored only the
    # bounding rectangle of its scalar fill, rounded to 8-row multiples
    Lc = sp.coo_matrix((np.ones(len(rows), np.int8), (rows, cols)))
    # compute per-slot row bounds via grouping
    o = np.argsort(key, kind="stable")
    ks, starts = np.unique(key[o], return_index=True)
    r = rows[o] % bs
    c = cols[o] % bs
    ends = np.r_[starts[1:], len(o)]
    rect = 0
    for s, e in zip(starts, ends):
        h = (int(r[s:e].max()) - int(r[s:e].min()) + 8) // 8 * 8
        w = (int(c[s:e].max()) - int(c[s:e].min()) + 8) // 8 * 8
        rect += min(h, bs) * min(w, bs)
    print(f"  bounding-rect(8) storage: {rect*4/2**30:.2f} GiB "
          f"({pool_entries/rect:.2f}x smaller than dense blocks)")


if __name__ == "__main__":
    for nx in [int(a) for a in sys.argv[1:] or ["50"]]:
        probe(nx, 128)
