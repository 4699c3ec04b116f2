"""Matrix I/O readers (reference fixtures + format round trips)."""

import os
import tempfile

import numpy as np
import pytest
import scipy.sparse as sp

from superlu_dist_tpu.utils import io as slu_io
from superlu_dist_tpu.utils.testing import REFERENCE_EXAMPLE_DIR

HAVE_REF = os.path.isdir(REFERENCE_EXAMPLE_DIR)


@pytest.mark.skipif(not HAVE_REF, reason="reference fixtures unavailable")
@pytest.mark.parametrize("name,shape,nnz,kind", [
    ("g4.rua", (16, 16), 64, "f"),
    ("g20.rua", (400, 400), 1920, "f"),
    ("big.rua", (4960, 4960), 23884, "f"),
    ("cg20.cua", (400, 400), 1920, "c"),
])
def test_reference_fixtures(name, shape, nnz, kind):
    A = slu_io.read_matrix(os.path.join(REFERENCE_EXAMPLE_DIR, name))
    assert A.shape == shape
    assert A.nnz == nnz
    assert A.dtype.kind == kind
    # the Laplacian-like fixtures have sane magnitudes
    assert 0 < np.abs(A.data).max() < 1e3


def test_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    A = sp.random(50, 50, density=0.1, random_state=rng, format="csc")
    p = tmp_path / "m.npz"
    slu_io.write_binary(p, A)
    B = slu_io.read_binary(p)
    assert (A != B).nnz == 0


def test_triple_reader(tmp_path):
    p = tmp_path / "t.triple"
    p.write_text("3 3 4\n1 1 2.0\n2 2 3.0\n3 3 4.0\n1 3 -1.0\n")
    A = slu_io.read_triple(p)
    assert A.shape == (3, 3)
    assert A[0, 0] == 2.0 and A[0, 2] == -1.0


def test_mm_reader(tmp_path):
    p = tmp_path / "m.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n"
                 "2 2 3\n1 1 1.0\n2 2 2.0\n2 1 -1.0\n")
    A = slu_io.read_matrix(str(p))
    assert A[1, 0] == -1.0


def test_nrloc_roundtrip():
    import numpy as np
    from superlu_dist_tpu.utils.nrloc import NRLocMatrix
    from superlu_dist_tpu.utils.testing import laplacian_2d
    A = laplacian_2d(6)
    loc = NRLocMatrix.from_global(A, 4)
    assert (loc.to_global() != A).nnz == 0
    x = np.arange(A.shape[0], dtype=float)
    parts = loc.scatter_solution(x)
    assert np.array_equal(loc.gather_rhs(parts), x)
