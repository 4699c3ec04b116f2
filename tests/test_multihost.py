"""Multi-host (2-process) execution of the distributed driver.

The analog of the reference's oversubscribed-mpiexec CI (.ci_tests.sh:
pdtest on 2/3/6 ranks of one node): two OS processes, each owning 4
virtual CPU devices, connected with ``jax.distributed.initialize``; the 2D
driver factors and solves over the global 2x4 mesh with preprocessing run
once on process 0 and broadcast (pdgssvx3d.c:628-959 layer-0 pattern).
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from superlu_dist_tpu.parallel import multihost as mh
    mh.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=2, process_id=pid)
    import numpy as np
    from superlu_dist_tpu import Options
    from superlu_dist_tpu.models.dist_driver import gssvx_dist
    from superlu_dist_tpu.parallel.grid import Grid2D
    from superlu_dist_tpu.utils.testing import laplacian_2d

    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, jax.devices()

    A = laplacian_2d(12)
    n = A.shape[0]
    rng = np.random.default_rng(7)
    b = np.asarray(A @ rng.standard_normal(n))
    grid = Grid2D(2, 4)          # spans both processes' devices
    res, lu = gssvx_dist(A, b, grid,
                         Options(dtype="float32", block_size=16))
    rel = float(np.abs(A @ res.x - b).max() / np.abs(b).max())
    assert rel < 1e-12, f"residual {rel}"
    assert float(res.berr.max()) < 1e-13, f"berr {res.berr}"
    # preprocessing ran only on process 0 (broadcast elsewhere)
    ran_rowperm = res.stat.utime.get("ROWPERM", 0.0) > 0.0
    assert ran_rowperm == (pid == 0), (pid, dict(res.stat.utime))
    print(f"MULTIHOST_OK pid={pid} rel={rel:.2e} "
          f"berr={float(res.berr.max()):.2e}", flush=True)
""")


def test_two_process_cpu_mesh(tmp_path):
    # ~13 s wall (measured) — runs in the default suite: multi-process
    # execution is a headline capability, not a slow-bucket extra
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid}" in out, out


_WORKER_NRLOC = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from superlu_dist_tpu.parallel import multihost as mh
    mh.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=2, process_id=pid)
    import numpy as np, scipy.sparse as sp
    from superlu_dist_tpu import Options
    from superlu_dist_tpu.models.dist_driver import gssvx_dist
    from superlu_dist_tpu.parallel.grid import Grid2D
    from superlu_dist_tpu.utils.nrloc import NRLocMatrix
    from superlu_dist_tpu.utils.testing import laplacian_2d

    A = laplacian_2d(12)
    n = A.shape[0]
    rng = np.random.default_rng(7)
    xt = rng.standard_normal(n)
    b = np.asarray(A @ xt)

    # THIS process's block-row chunk ONLY (true NRformat_loc input);
    # global A values must never materialize on process 1
    Ar = sp.csr_matrix(A)
    half = n // 2
    lo, hi = (0, half) if pid == 0 else (half, n)
    Aloc = NRLocMatrix([(lo, Ar[lo:hi])], n, local=True)
    import superlu_dist_tpu.utils.nrloc as nrloc_mod
    calls = []
    orig = nrloc_mod.NRLocMatrix.to_global
    def guard(self):
        calls.append(1)
        return orig(self)
    nrloc_mod.NRLocMatrix.to_global = guard

    res, lu = gssvx_dist(Aloc, b, Grid2D(2, 4),
                         Options(dtype="float32", block_size=16))
    rel = float(np.abs(res.x - xt).max() / np.abs(xt).max())
    assert rel < 1e-5, f"solution err {rel}"
    assert float(res.berr.max()) < 1e-13, f"berr {res.berr}"
    assert not calls, "to_global must never run in sharded mode"
    if pid != 0:
        # host memory holds only the local rows
        assert lu._A_orig.nnz == Ar[half:].nnz, lu._A_orig.nnz
    print(f"MULTIHOST_NRLOC_OK pid={pid} rel={rel:.2e}", flush=True)
""")


def test_two_process_nrloc_sharded(tmp_path):
    """Sharded NRLoc input: gssvx_dist on per-process row chunks, global
    A values never gathered host-side anywhere but process 0 (the
    dReDistribute_A contract, reference: pddistribute.c:66-433)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker_nrloc.py"
    script.write_text(_WORKER_NRLOC)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST_NRLOC_OK pid={pid}" in out, out


_WORKER_3D = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from superlu_dist_tpu.parallel import multihost as mh
    mh.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=2, process_id=pid)
    import numpy as np
    from superlu_dist_tpu import Options, Trans
    from superlu_dist_tpu.models.driver3d import gssvx3d
    from superlu_dist_tpu.parallel.grid import Grid3D
    from superlu_dist_tpu.utils.testing import laplacian_2d

    A = laplacian_2d(12)
    n = A.shape[0]
    rng = np.random.default_rng(7)
    xt = rng.standard_normal(n)
    b = np.asarray(A @ xt)
    grid = Grid3D(2, 2, 2)       # spans both processes' devices
    res, lu = gssvx3d(A, b, grid,
                      Options(dtype="float32", block_size=16))
    rel = float(np.abs(res.x - xt).max() / np.abs(xt).max())
    assert rel < 1e-5, f"solution err {rel}"
    assert float(res.berr.max()) < 1e-13, f"berr {res.berr}"
    # preprocessing ran only on process 0 (PreprocessOnce broadcast)
    ran_rowperm = res.stat.utime.get("ROWPERM", 0.0) > 0.0
    assert ran_rowperm == (pid == 0), (pid, dict(res.stat.utime))
    # transposed solve across the 3D mesh, multi-process
    xT = lu.solve(np.asarray(A.T @ xt), trans=Trans.TRANS)
    relT = float(np.abs(xT - xt).max() / np.abs(xt).max())
    assert relT < 1e-4, f"trans err {relT}"

    # sharded NRLoc input on the 3D grid: this process's rows only,
    # global A values never off process 0
    import scipy.sparse as sp
    from superlu_dist_tpu.utils.nrloc import NRLocMatrix
    Ar = sp.csr_matrix(A)
    half = n // 2
    lo, hi = (0, half) if pid == 0 else (half, n)
    Aloc = NRLocMatrix([(lo, Ar[lo:hi])], n, local=True)
    res3, lu3 = gssvx3d(Aloc, b, Grid3D(2, 2, 2),
                        Options(dtype="float32", block_size=16))
    rel3 = float(np.abs(res3.x - xt).max() / np.abs(xt).max())
    assert rel3 < 1e-5, f"3D NRLoc err {rel3}"
    if pid != 0:
        assert lu3._A_orig.nnz == Ar[half:].nnz

    # multi-process checkpoint from the 3D mesh (owner-gather; ancestor
    # replicas contribute exactly once) must round-trip through the
    # single-chip solve path
    from superlu_dist_tpu.models.driver import save_factors
    import tempfile
    ckpt = os.path.join(tempfile.gettempdir(),
                        f"slu_3d_ckpt_{port}.npz")
    save_factors(lu, ckpt)
    if pid == 0:
        from superlu_dist_tpu.models.driver import load_factors
        lu_l = load_factors(ckpt)
        xl, berr_l = lu_l.refine(b, lu_l.solve(b))
        rel_l = float(np.abs(xl - xt).max() / np.abs(xt).max())
        assert rel_l < 1e-5, f"3D ckpt roundtrip err {rel_l}"
        os.unlink(ckpt)
    print(f"MULTIHOST_3D_OK pid={pid} rel={rel:.2e} trans={relT:.2e} "
          f"nrloc={rel3:.2e}", flush=True)
""")


def test_two_process_3d_mesh(tmp_path):
    """2-process 3D driver: z-replicated factorization over a mesh
    spanning both processes, preprocessing once on process 0
    (pdgssvx3d.c:628-959 layer-0 pattern), solve + refine + Aᵀ solve."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker3d.py"
    script.write_text(_WORKER_3D)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST_3D_OK pid={pid}" in out, out


_WORKER_NRLOC_REUSE = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]; ckpt = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from superlu_dist_tpu.parallel import multihost as mh
    mh.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=2, process_id=pid)
    import numpy as np, scipy.sparse as sp
    from superlu_dist_tpu import Options
    from superlu_dist_tpu.models.dist_driver import DistributedSparseLU
    from superlu_dist_tpu.models.driver import save_factors
    from superlu_dist_tpu.parallel.grid import Grid2D
    from superlu_dist_tpu.utils.nrloc import NRLocMatrix
    from superlu_dist_tpu.utils.options import Fact
    from superlu_dist_tpu.utils.testing import laplacian_2d

    A = laplacian_2d(12)
    n = A.shape[0]
    rng = np.random.default_rng(7)
    xt = rng.standard_normal(n)

    Ar = sp.csr_matrix(A)
    half = n // 2
    def chunks_of(M):
        Mr = sp.csr_matrix(M)
        lo, hi = (0, half) if pid == 0 else (half, n)
        return NRLocMatrix([(lo, Mr[lo:hi])], n, local=True)

    # guard: global A values must never materialize off process 0
    import superlu_dist_tpu.utils.nrloc as nrloc_mod
    calls = []
    orig = nrloc_mod.NRLocMatrix.to_global
    def guard(self):
        calls.append(1); return orig(self)
    nrloc_mod.NRLocMatrix.to_global = guard

    lu = DistributedSparseLU(chunks_of(A), Grid2D(2, 4),
                             Options(dtype="float32", block_size=16))
    b = np.asarray(A @ xt)
    x, berr = lu.refine(b, lu.solve(b))
    assert float(np.abs(x - xt).max() / np.abs(xt).max()) < 1e-5

    # ---- SamePattern_SameRowPerm refactor with sharded chunks ----
    A2 = A.copy(); A2.data = A2.data * 1.5
    lu.refactor(chunks_of(A2), fact=Fact.SAME_PATTERN_SAME_ROWPERM)
    b2 = np.asarray(A2 @ xt)
    x2, berr2 = lu.refine(b2, lu.solve(b2))
    rel2 = float(np.abs(x2 - xt).max() / np.abs(xt).max())
    assert rel2 < 1e-5, f"SPSRP refactor err {rel2}"
    assert float(berr2.max()) < 1e-13, f"SPSRP berr {berr2}"

    # ---- SamePattern refactor (fresh equil + rowperm on process 0) ----
    A3m = A.copy(); A3m.data = A3m.data * np.linspace(0.5, 2.0, A.nnz)
    A3m = sp.csc_matrix((A3m.data, A3m.indices, A3m.indptr), shape=A.shape)
    lu.refactor(chunks_of(A3m), fact=Fact.SAME_PATTERN)
    b3 = np.asarray(A3m @ xt)
    x3, berr3 = lu.refine(b3, lu.solve(b3))
    rel3 = float(np.abs(x3 - xt).max() / np.abs(xt).max())
    assert rel3 < 1e-4, f"SamePattern refactor err {rel3}"
    assert float(berr3.max()) < 1e-13, f"SamePattern berr {berr3}"
    assert not calls, "to_global must never run in sharded mode"

    # ---- per-level profiling with sharded input (SCT analog) ----
    rows = lu.profile_levels()
    assert len(rows) > 0 and all("ms" in r for r in rows)

    # ---- checkpoint from the 2-process session (owner-gather) ----
    save_factors(lu, ckpt)
    if pid == 0:
        assert os.path.exists(ckpt)
    print(f"MULTIHOST_NRLOC_REUSE_OK pid={pid}", flush=True)
""")


def test_two_process_nrloc_reuse_and_checkpoint(tmp_path):
    """fact_t staging (SamePattern / SamePattern_SameRowPerm) with
    sharded NRLoc input, and save_factors from a 2-process session via
    in-mesh owner-gather; the checkpoint must load single-process as a
    portable SolveOnly object (reference: pdgssvx.c:506-2783 staging
    with distributed input + dgatherAllFactoredLU pd3dcomm.c:1083)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker_nrloc_reuse.py"
    script.write_text(_WORKER_NRLOC_REUSE)
    ckpt = str(tmp_path / "dist_ckpt.npz")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port), ckpt],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST_NRLOC_REUSE_OK pid={pid}" in out, out

    # the checkpoint (written by process 0 from the in-mesh gather)
    # restores a solve-ready single-process object
    import scipy.sparse as ssp
    from superlu_dist_tpu.models.driver import load_factors
    from superlu_dist_tpu.utils.testing import laplacian_2d
    A = laplacian_2d(12)
    A3m = A.copy()
    A3m.data = A3m.data * np.linspace(0.5, 2.0, A.nnz)   # last refactor
    A3m = ssp.csc_matrix((A3m.data, A3m.indices, A3m.indptr),
                         shape=A.shape)
    lu = load_factors(ckpt)
    n = A.shape[0]
    xt = np.random.default_rng(7).standard_normal(n)
    b = np.asarray(A3m @ xt)
    x, berr = lu.refine(b, lu.solve(b))
    rel = float(np.abs(x - xt).max() / np.abs(xt).max())
    assert rel < 1e-4, rel
    assert float(berr.max()) < 1e-13


_WORKER_DIST_PLANNING = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from superlu_dist_tpu.parallel import multihost as mh
    mh.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=2, process_id=pid)
    import hashlib
    import numpy as np, scipy.sparse as sp
    from superlu_dist_tpu import Options
    from superlu_dist_tpu.models.dist_driver import DistributedSparseLU
    from superlu_dist_tpu.parallel.grid import Grid2D
    from superlu_dist_tpu.utils.nrloc import NRLocMatrix
    from superlu_dist_tpu.utils.options import ColPerm, Equil, RowPerm
    from superlu_dist_tpu.utils.testing import laplacian_2d

    A = laplacian_2d(12)
    n = A.shape[0]
    rng = np.random.default_rng(7)
    xt = rng.standard_normal(n)
    b = np.asarray(A @ xt)

    Ar = sp.csr_matrix(A)
    half = n // 2
    lo, hi = (0, half) if pid == 0 else (half, n)
    Aloc = NRLocMatrix([(lo, Ar[lo:hi])], n, local=True)

    # guards: neither the global VALUES (gather_values_to0) nor the
    # global pattern (to_global) may materialize on ANY process
    import superlu_dist_tpu.utils.nrloc as nrloc_mod
    import superlu_dist_tpu.parallel.dist2d as dist2d_mod
    calls = []
    orig_tg = nrloc_mod.NRLocMatrix.to_global
    nrloc_mod.NRLocMatrix.to_global = (
        lambda self: (calls.append("to_global"), orig_tg(self))[1])
    orig_gv = dist2d_mod.gather_values_to0
    dist2d_mod.gather_values_to0 = (
        lambda *a, **k: (calls.append("gather_values_to0"),
                         orig_gv(*a, **k))[1])

    lu = DistributedSparseLU(
        Aloc, Grid2D(2, 4),
        Options(dtype="float32", block_size=16, dist_planning=True,
                equil=Equil.NO, row_perm=RowPerm.NOROWPERM,
                col_perm=ColPerm.NATURAL))
    x, berr = lu.refine(b, lu.solve(b))
    rel = float(np.abs(x - xt).max() / np.abs(xt).max())
    assert rel < 1e-5, f"dist-planning solve err {rel}"
    assert float(berr.max()) < 1e-13, f"berr {berr}"
    assert not calls, f"global pattern/value gather ran: {calls}"
    assert lu._A_orig.nnz == Ar[lo:hi].nnz   # only local rows held
    assert len(lu.plan.init_idx) == 0        # no global value placement

    # plan checksum (everything except the value-placement fields) for
    # bit-identity vs the serial plan, checked by the test harness
    import dataclasses
    hsh = hashlib.sha256()
    for f in sorted(f.name for f in dataclasses.fields(lu.plan)):
        if f == "init_idx":
            continue
        v = getattr(lu.plan, f)
        hsh.update(np.ascontiguousarray(np.asarray(v)).tobytes())
    print(f"DIST_PLANNING_OK pid={pid} plan_sha={hsh.hexdigest()} "
          f"blocks={lu.stat.counters['dist_planning_blocks']}", flush=True)
""")


def test_two_process_distributed_planning(tmp_path):
    """Distributed planning (psymbfact analog): with sharded NRLoc input
    and dist_planning=True, NO process — including process 0 — gathers
    the global values or pattern; only block keys are allgathered, and
    the resulting plan is bit-identical to the serial plan (reference:
    SRC/prec-independent/psymbfact.c:26-5380)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker_dist_planning.py"
    script.write_text(_WORKER_DIST_PLANNING)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    shas = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"DIST_PLANNING_OK pid={pid}" in out, out
        for line in out.splitlines():
            if line.startswith("DIST_PLANNING_OK"):
                shas.append(line.split("plan_sha=")[1].split()[0])
    assert shas[0] == shas[1]

    # bit-identity vs the serial plan on the same (natural-order) matrix
    import dataclasses
    import hashlib
    from superlu_dist_tpu.ops.host.symbolic import block_symbolic
    from superlu_dist_tpu.utils.testing import laplacian_2d
    plan = block_symbolic(laplacian_2d(12).tocsc(), 16)
    hsh = hashlib.sha256()
    for f in sorted(f.name for f in dataclasses.fields(plan)):
        if f == "init_idx":
            continue
        hsh.update(np.ascontiguousarray(
            np.asarray(getattr(plan, f))).tobytes())
    assert hsh.hexdigest() == shas[0], "dist plan differs from serial"


_WORKER_DIST_PLANNING_3D = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from superlu_dist_tpu.parallel import multihost as mh
    mh.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=2, process_id=pid)
    import numpy as np, scipy.sparse as sp
    from superlu_dist_tpu import Options
    from superlu_dist_tpu.models.driver3d import Distributed3DSparseLU
    from superlu_dist_tpu.parallel.grid import Grid3D
    from superlu_dist_tpu.utils.nrloc import NRLocMatrix
    from superlu_dist_tpu.utils.options import ColPerm, Equil, RowPerm
    from superlu_dist_tpu.utils.testing import laplacian_2d

    A = laplacian_2d(10)
    n = A.shape[0]
    rng = np.random.default_rng(7)
    xt = rng.standard_normal(n)
    b = np.asarray(A @ xt)
    Ar = sp.csr_matrix(A)
    half = n // 2
    lo, hi = (0, half) if pid == 0 else (half, n)
    Aloc = NRLocMatrix([(lo, Ar[lo:hi])], n, local=True)

    import superlu_dist_tpu.parallel.dist2d as dist2d_mod
    calls = []
    orig_gv = dist2d_mod.gather_values_to0
    dist2d_mod.gather_values_to0 = (
        lambda *a, **k: (calls.append("gather"), orig_gv(*a, **k))[1])

    lu = Distributed3DSparseLU(
        Aloc, Grid3D(2, 2, 2),    # spans both processes' devices
        Options(dtype="float32", block_size=16, dist_planning=True,
                equil=Equil.NO, row_perm=RowPerm.NOROWPERM,
                col_perm=ColPerm.NATURAL))
    x, berr = lu.refine(b, lu.solve(b))
    rel = float(np.abs(x - xt).max() / np.abs(xt).max())
    assert rel < 1e-5, f"3D dist-planning err {rel}"
    assert not calls, "global value gather ran in dist_planning mode"
    assert len(lu.plan.init_idx) == 0
    print(f"DIST_PLANNING_3D_OK pid={pid}", flush=True)
""")


def test_two_process_distributed_planning_3d(tmp_path):
    """dist_planning is mesh-dimension agnostic (the ShardedNRLocInput
    mixin serves both drivers): 3D grid, sharded input, no global
    value/pattern gather."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker_dp3d.py"
    script.write_text(_WORKER_DIST_PLANNING_3D)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"DIST_PLANNING_3D_OK pid={pid}" in out, out
