"""superlu_dist_tpu — a TPU-native distributed sparse direct solver.

Built from scratch with the capabilities of SuperLU_DIST (GESP: Gaussian
elimination with static pivoting) but architected for TPUs: the numeric
factorization and triangular solves are tape-driven batched MXU GEMM
programs compiled once per sparsity pattern; distribution uses
``jax.sharding`` meshes (2D block-cyclic + 3D elimination-forest axes)
instead of MPI ranks. See SURVEY.md for the reference structural map.

Quick start::

    import scipy.sparse as sp
    from superlu_dist_tpu import gssvx, Options

    result, lu = gssvx(A, b, Options(dtype="float32"))
    x = result.x                       # refined to float64-quality
    x2 = lu.solve(b2)                  # reuse the factorization
"""

# float64 / complex128 paths (the reference's d/z precisions) require x64.
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# The executors compile once per sparsity pattern; cache compilations across
# processes (overridable via SLU_TPU_CACHE_DIR, disable with empty string).
_cache = _os.environ.get("SLU_TPU_CACHE_DIR", "/tmp/slu_tpu_jax_cache")
if _cache:
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Keep Python-traceback source locations OUT of lowered programs: the
# Mosaic kernel payload embeds MLIR location metadata, so two byte-identical
# factorization programs traced from different user call sites (or even the
# same site twice in one process) serialize differently and defeat the
# persistent compile cache — the dominant first-touch cost (measured: a
# same-bucket matrix re-compiled 245 s instead of hitting cache in <10 s).
# Opt back in for debugging with SLU_TPU_FULL_TRACEBACKS=1.
if _os.environ.get("SLU_TPU_FULL_TRACEBACKS", "") != "1":
    _jax.config.update("jax_include_full_tracebacks_in_locations", False)

from .version import __version__, get_version_number
from .utils.options import (ColPerm, DiagScale, Equil, Fact, IterRefine,
                            Options, RowPerm, Trans, set_default_options,
                            sp_ienv, print_options)
from .utils.stats import Stats
from .utils.nrloc import NRLocMatrix
from .models.driver import (SparseLU, SolveResult, gssvx, load_factors,
                            save_factors)
from .models.dist_driver import DistributedSparseLU, gssvx_dist
from .models.driver3d import Distributed3DSparseLU, gssvx3d
from .models.batch import BatchedSparseLU, gssvx_batch
from .parallel.grid import Grid2D, Grid3D

__all__ = [
    "__version__", "get_version_number",
    "Options", "Fact", "Equil", "RowPerm", "ColPerm", "Trans", "IterRefine",
    "DiagScale", "set_default_options", "sp_ienv", "print_options",
    "Stats", "SparseLU", "SolveResult", "gssvx",
    "save_factors", "load_factors", "NRLocMatrix",
    "DistributedSparseLU", "gssvx_dist",
    "Distributed3DSparseLU", "gssvx3d",
    "BatchedSparseLU", "gssvx_batch",
    "Grid2D", "Grid3D",
]
