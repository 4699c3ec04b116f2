"""C ABI bridge: a plain-C program factors and solves through the shim.

The pdbridge parity check (reference: PYTHON/pdbridge.h:27-37): compile a
real C consumer against superlu_dist_tpu.h + libsuperlu_dist_tpu.so, have
it load the reference's g20.rua fixture, factor, solve A x = b for
b = A·1, and verify the solution from the C side.
"""

import os
import shutil
import subprocess
import sys
import sysconfig

import numpy as np
import pytest

from superlu_dist_tpu.utils import cbridge

REFERENCE = "/root/reference/EXAMPLE/g20.rua"

C_PROGRAM = r"""
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "superlu_dist_tpu.h"

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s matrix\n", argv[0]); return 2; }

    /* smoke: tiny CSC through slu_tpu_init */
    {
        int64_t colptr[3] = {0, 1, 2};
        int64_t rowind[2] = {0, 1};
        double vals[2] = {2.0, 4.0};
        int64_t h = slu_tpu_init(2, colptr, rowind, vals, NULL, 2);
        if (!h) { fprintf(stderr, "init: %s\n", slu_tpu_last_error()); return 1; }
        if (slu_tpu_factor(h, "{\"dtype\": \"float32\"}") != 0) {
            fprintf(stderr, "factor: %s\n", slu_tpu_last_error()); return 1;
        }
        double sr, si, la;
        if (slu_tpu_logdet(h, &sr, &si, &la) != 0) {
            fprintf(stderr, "logdet: %s\n", slu_tpu_last_error()); return 1;
        }
        if (fabs(la - log(8.0)) > 1e-5 || fabs(sr - 1.0) > 1e-5) {
            fprintf(stderr, "logdet wrong: %g %g\n", sr, la); return 1;
        }
        double b[2] = {2.0, 8.0};
        if (slu_tpu_solve(h, b, 1, 0, 1) != 0) {
            fprintf(stderr, "solve: %s\n", slu_tpu_last_error()); return 1;
        }
        if (fabs(b[0] - 1.0) > 1e-5 || fabs(b[1] - 2.0) > 1e-5) {
            fprintf(stderr, "tiny solve wrong: %g %g\n", b[0], b[1]); return 1;
        }
        slu_tpu_free(h);
    }

    /* the reference fixture through the full pipeline */
    int64_t h = slu_tpu_read_matrix(argv[1]);
    if (!h) { fprintf(stderr, "read: %s\n", slu_tpu_last_error()); return 1; }
    int64_t n = slu_tpu_n(h);
    if (n <= 0) { fprintf(stderr, "n: %s\n", slu_tpu_last_error()); return 1; }

    int info = slu_tpu_factor(h, "{\"dtype\": \"float32\"}");
    if (info != 0) { fprintf(stderr, "factor info=%d: %s\n", info,
                             slu_tpu_last_error()); return 1; }

    double *ones = (double *)malloc(n * sizeof(double));
    double *b = (double *)malloc(n * sizeof(double));
    for (int64_t i = 0; i < n; ++i) ones[i] = 1.0;
    if (slu_tpu_matvec(h, ones, b) != 0) {
        fprintf(stderr, "matvec: %s\n", slu_tpu_last_error()); return 1;
    }
    if (slu_tpu_solve(h, b, 1, 0, 1) != 0) {
        fprintf(stderr, "solve: %s\n", slu_tpu_last_error()); return 1;
    }
    double maxerr = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        double e = fabs(b[i] - 1.0);
        if (e > maxerr) maxerr = e;
    }
    slu_tpu_free(h);
    free(ones);
    free(b);
    printf("CBRIDGE OK n=%lld maxerr=%.3e\n", (long long)n, maxerr);
    return maxerr < 1e-4 ? 0 : 1;
}
"""


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
@pytest.mark.skipif(not os.path.exists(REFERENCE),
                    reason="reference fixture unavailable")
def test_c_program_solves_g20(tmp_path):
    so = cbridge.build_bridge()
    header_dir = os.path.dirname(cbridge.bridge_header())

    csrc = tmp_path / "consumer.c"
    csrc.write_text(C_PROGRAM)
    prog = tmp_path / "consumer"
    libdir = sysconfig.get_config_var("LIBDIR")
    subprocess.run(
        ["g++", "-O1", str(csrc), so, "-o", str(prog),
         f"-I{header_dir}", f"-Wl,-rpath,{os.path.dirname(so)}",
         f"-Wl,-rpath,{libdir}", "-lm"],
        check=True, capture_output=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    site = [p for p in sys.path if "site-packages" in p]
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([repo] + site)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([str(prog), REFERENCE], env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, (out.stdout, out.stderr[-2000:])
    assert "CBRIDGE OK" in out.stdout


def test_cbridge_python_side_roundtrip():
    """The handle registry itself (no compiler needed)."""
    import scipy.sparse as sp
    A = sp.random(50, 50, density=0.1, random_state=0,
                  format="csc") + sp.eye(50) * 5.0
    A = sp.csc_matrix(A)
    h = cbridge.init(50, A.indptr, A.indices, A.data)
    assert h > 0
    assert cbridge.factor(h, '{"dtype": "float32"}') == 0
    assert cbridge.handle_n(h) == 50
    xt = np.ones(50)
    b = np.empty(50)
    assert cbridge.matvec(h, xt, b) == 0
    buf = b.copy()
    assert cbridge.solve(h, buf, 1) == 0
    assert np.abs(buf - 1.0).max() < 1e-5
    sr, si, la = cbridge.logdet(h)
    lu = __import__("scipy.sparse.linalg", fromlist=["splu"]).splu(
        A.astype(np.float64))
    la_ref = float(np.log(np.abs(lu.U.diagonal())).sum())
    assert abs(la - la_ref) < 1e-3
    cbridge.free(h)
    assert cbridge.handle_n(h) == -1
