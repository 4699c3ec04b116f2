"""Multi-host (multi-process) execution support.

The reference is a distributed-memory solver: every rank holds a shard and
MPI carries collectives (superlu_gridinit splits MPI_COMM_WORLD, reference:
SRC/prec-independent/superlu_grid.c:37-230). The TPU-native analog is JAX
multi-process execution: ``jax.distributed.initialize`` connects the hosts,
the ``Mesh`` spans every process's devices, and XLA lowers the same psums
to ICI within a slice and DCN across slices.

Roles of this module:

- :func:`initialize` — one-call process bootstrap (superlu_gridinit's
  MPI_Init role).
- :func:`replicate` / :func:`shard` — host arrays → global jax Arrays
  (every process passes the same host value; under a single process these
  are plain ``jnp.asarray``, so the drivers pay nothing when not
  distributed).
- :func:`bcast_obj` — preprocessing-once: process 0 runs the host pipeline
  (equilibration, MC64, ordering, symbolic) and broadcasts the pickled
  results, mirroring pdgssvx3d's layer-0-preprocess-then-MPI_Bcast
  (reference: SRC/double/pdgssvx3d.c:628-959).
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["initialize", "process_count", "process_index", "replicate",
           "shard", "bcast_obj", "allgather_obj", "gather_sharded_blocks",
           "PreprocessOnce"]


class PreprocessOnce:
    """Driver mixin: host preprocessing runs ONCE on process 0 and is
    broadcast — equilibration, MC64/HWPM, ordering, alignment, symbolic
    (the layer-0-preprocess-then-MPI_Bcast pattern of pdgssvx3d,
    reference: SRC/double/pdgssvx3d.c:628-959). Single-process: plain
    inheritance, zero overhead."""

    def _preprocess(self, A, reuse_perms: bool, reuse_colperm: bool):
        import scipy.sparse as sp
        if process_count() == 1 or reuse_perms:
            # local preprocessing recomputes everything from THIS A —
            # stale broadcast norms from a previous factorization would
            # otherwise set the tiny-pivot threshold / rcond scale from
            # the old matrix's values
            self._anorm_global = None
            self._anorm1_global = None
            self._nz_global = None
            return super()._preprocess(A, reuse_perms, reuse_colperm)
        if process_index() == 0:
            A3 = super()._preprocess(A, reuse_perms, reuse_colperm)
            extras = dict(
                anorm=float(np.abs(A3.data).max()) if A3.nnz else 1.0,
                anorm1=float(np.abs(A).sum(axis=0).max()),
                nz=int(A.getnnz(axis=1).max()))
            bcast_obj((self.row_scale, self.col_scale, self.rowperm,
                       self.colperm, self._expand, self._n_e,
                       self.equed, extras))
            self._anorm_global = extras["anorm"]
            self._anorm1_global = extras["anorm1"]
            self._nz_global = extras["nz"]
            return A3
        (self.row_scale, self.col_scale, self.rowperm, self.colperm,
         self._expand, self._n_e, self.equed, extras) = bcast_obj()
        self._anorm_global = extras["anorm"]
        self._anorm1_global = extras["anorm1"]
        self._nz_global = extras["nz"]
        A3 = A.multiply(self.row_scale[:, None]) \
             .multiply(self.col_scale[None, :]).tocsc()
        A3 = A3[self.rowperm, :][self.colperm, :][:, self.colperm]
        return self._expand_A(sp.csc_matrix(A3))

    def _symbolic(self, A3):
        if process_count() == 1:
            return super()._symbolic(A3)
        if process_index() == 0:
            plan = super()._symbolic(A3)
            bcast_obj(plan)
            return plan
        return bcast_obj()


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Connect this process to the multi-host runtime (MPI_Init role).

    On TPU pods with standard orchestration all arguments are discovered
    automatically; explicit values support CPU/GPU multi-process testing
    (the oversubscribed-mpiexec analog of the reference's CI,
    .ci_tests.sh). On the CPU backend, cross-process collectives need the
    gloo implementation — selected here automatically."""
    import os
    plats = (os.environ.get("JAX_PLATFORMS", "")
             or jax.config.jax_platforms or "")
    if "cpu" in plats.split(","):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def replicate(mesh, arr):
    """Host array → mesh-replicated global Array (single-process: asarray).

    Every process must pass the same value (it is NOT broadcast — use
    :func:`bcast_obj` first if only one process has it)."""
    if jax.process_count() == 1:
        return jnp.asarray(arr)
    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def shard(mesh, spec, arr):
    """Host array → global Array sharded by ``spec`` over ``mesh``.

    Every process passes the full host array; each device receives only
    its shard via the callback (owner-computed, no cross-host traffic)."""
    if jax.process_count() == 1:
        return jnp.asarray(arr)
    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def gather_sharded_blocks(mesh, spec, arr, glob_ids, out_rows: int):
    """Collect device-sharded block rows into one replicated global table
    (the owner-gather behind multi-process ``save_factors``; reference
    analog: dgatherAllFactoredLU, pd3dcomm.c:1083).

    ``arr``: global Array sharded by ``spec``, shape = mesh dims +
    (n_local, B, B). ``glob_ids``: same sharding, mesh dims + (n_local,)
    int32 global row of each local row — point padding rows at an unused
    trash id < ``out_rows``. Each real row must have exactly ONE owner
    across the mesh (zeros + psum = the value). Returns the replicated
    (out_rows, B, B) table as a host numpy array (every process gets the
    full result; the caller decides who writes it).
    """
    from jax import lax, shard_map

    nlead = len(mesh.axis_names)
    bs = arr.shape[-1]

    def spmd(a, g):
        al = a[(0,) * nlead]
        gl = g[(0,) * nlead]
        out = jnp.zeros((out_rows, bs, bs), a.dtype).at[gl].add(al)
        for ax in mesh.axis_names:
            out = lax.psum(out, ax)
        return out

    fn = shard_map(spmd, mesh=mesh, in_specs=(spec, spec),
                   out_specs=P(), check_vma=False)
    # writable copy: callers zero the trash rows in place
    return np.array(jax.jit(fn)(arr, glob_ids))


def allgather_obj(obj):
    """Allgather one picklable object per process; every process returns
    the list [obj_0, ..., obj_{P-1}] in process order (the MPI_Allgatherv
    role behind distributed planning — payloads are block-level keys,
    O(a_blocks), never the scalar pattern)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils as mhu
    buf = np.frombuffer(pickle.dumps(obj), dtype=np.uint8).copy()
    n = int(len(buf))
    sizes = np.asarray(mhu.process_allgather(np.array([n], np.int64)))
    sizes = sizes.reshape(-1)
    m = int(sizes.max())
    pad = np.zeros(m, dtype=np.uint8)
    pad[:n] = buf
    all_bufs = np.asarray(mhu.process_allgather(pad))
    return [pickle.loads(all_bufs[p, : sizes[p]].tobytes())
            for p in range(jax.process_count())]


def bcast_obj(obj=None):
    """Broadcast a picklable object from process 0 to every process
    (pdgssvx3d's MPI_Bcast of perms/scalars, pdgssvx3d.c:850-959).

    Process 0 passes the object; the others pass None and receive it.
    Single-process: returns ``obj`` unchanged."""
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils as mhu
    if jax.process_index() == 0:
        buf = np.frombuffer(pickle.dumps(obj), dtype=np.uint8).copy()
        n = np.array(len(buf), dtype=np.int64)
    else:
        buf = None
        n = np.array(0, dtype=np.int64)
    n = int(mhu.broadcast_one_to_all(n))
    if buf is None or len(buf) != n:
        buf = np.zeros(n, dtype=np.uint8)
    buf = np.asarray(mhu.broadcast_one_to_all(buf))
    return pickle.loads(buf.tobytes())
