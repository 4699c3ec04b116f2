"""sp_ienv tuning oracle + SLU_TPU_* environment surface.

Analog of the reference's sp_ienv_dist / SUPERLU_* env-var tier
(sp_ienv.c:81-179): env beats options beats defaults, and the drivers
fold every set spec var once at entry (apply_env_overrides).
"""

import os

import numpy as np
import pytest

from superlu_dist_tpu.utils.options import (Options, ColPerm, Equil,
                                            RowPerm, _SPEC_FIELDS,
                                            apply_env_overrides, sp_ienv)


@pytest.fixture
def clean_env():
    saved = {k: v for k, v in os.environ.items()
             if k.startswith("SLU_TPU_")}
    for k in saved:
        del os.environ[k]
    yield
    for k in list(os.environ):
        if k.startswith("SLU_TPU_"):
            del os.environ[k]
    os.environ.update(saved)


def test_env_beats_options(clean_env):
    opts = Options(block_size=64)
    assert sp_ienv("BLOCK_SIZE", opts) == 64
    os.environ["SLU_TPU_BLOCK_SIZE"] = "128"
    assert sp_ienv("BLOCK_SIZE", opts) == 128


def test_every_spec_is_covered(clean_env):
    """Each spec maps to a real Options field with a working converter."""
    opts = Options()
    for spec, (field, conv) in _SPEC_FIELDS.items():
        assert hasattr(opts, field), spec
        # defaults flow through
        assert sp_ienv(spec, opts) == getattr(opts, field)


def test_apply_env_overrides_folds_everything(clean_env):
    os.environ["SLU_TPU_BLOCK_SIZE"] = "32"
    os.environ["SLU_TPU_EXECUTOR"] = "flk"
    os.environ["SLU_TPU_REPLACE_TINY_PIVOT"] = "0"
    os.environ["SLU_TPU_EQUIL"] = "no"
    os.environ["SLU_TPU_ROWPERM"] = RowPerm.NOROWPERM.value
    os.environ["SLU_TPU_COLPERM"] = ColPerm.NATURAL.value
    o = apply_env_overrides(Options())
    assert o.block_size == 32
    assert o.executor == "flk"
    assert o.replace_tiny_pivot is False
    assert o.equil == Equil.NO
    assert o.row_perm == RowPerm.NOROWPERM
    assert o.col_perm == ColPerm.NATURAL


def test_driver_respects_env(clean_env):
    """SparseLU folds env overrides at entry: NATURAL colperm + no equil
    leaves A unpermuted/unscaled."""
    from superlu_dist_tpu import SparseLU
    from superlu_dist_tpu.utils.testing import laplacian_2d
    os.environ["SLU_TPU_COLPERM"] = "NATURAL"
    os.environ["SLU_TPU_EQUIL"] = "no"
    os.environ["SLU_TPU_ROWPERM"] = "NOROWPERM"
    A = laplacian_2d(8).astype(np.float64)
    lu = SparseLU(A, Options(dtype="float64"))
    assert np.array_equal(lu.colperm, np.arange(A.shape[0]))
    assert np.all(lu.row_scale == 1.0)
    b = np.asarray(A @ np.ones(A.shape[0]))
    x = lu.solve(b)
    assert np.abs(A @ x - b).max() < 1e-10


def test_checklu_and_writelu_env_hooks(monkeypatch, tmp_path):
    """Env-gated factorization audits (reference CHECKLU / WRITELU env
    hooks): CHECKLU records the LU reconstruction residual in stats,
    WRITELU dumps a pool that compare_lu accepts."""
    import numpy as np
    from superlu_dist_tpu import Options, SparseLU
    from superlu_dist_tpu.utils.debug import compare_lu
    from superlu_dist_tpu.utils.testing import laplacian_2d

    p = tmp_path / "lu.npz"
    monkeypatch.setenv("SLU_TPU_CHECKLU", "1")
    monkeypatch.setenv("SLU_TPU_WRITELU", str(p))
    A = laplacian_2d(10)
    lu = SparseLU(A, Options(dtype="float64", block_size=8))
    assert lu.stat.counters["checklu_max_resid"] < 1e-10
    assert p.exists()
    assert compare_lu(p, p)
