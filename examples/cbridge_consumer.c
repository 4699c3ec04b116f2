/* C consumer of the superlu_dist_tpu C ABI (pdbridge parity).
 *
 * Build + run:
 *   SO=$(python -c "from superlu_dist_tpu.utils.cbridge import build_bridge; print(build_bridge())")
 *   HDR=$(python -c "from superlu_dist_tpu.utils.cbridge import bridge_header; import os; print(os.path.dirname(bridge_header()))")
 *   g++ examples/cbridge_consumer.c "$SO" -I"$HDR" -Wl,-rpath,$(dirname "$SO") -lm -o consumer
 *   JAX_PLATFORMS=cpu PYTHONPATH=. ./consumer path/to/matrix.rua
 *
 * Mirrors the reference's PYTHON/pdbridge flow (init → factor → solve →
 * logdet → free) from plain C. See tests/test_cbridge.py for the CI
 * version of this program.
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "superlu_dist_tpu.h"

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s matrix.{rua,rb,mtx}\n", argv[0]);
        return 2;
    }
    int64_t h = slu_tpu_read_matrix(argv[1]);
    if (!h) {
        fprintf(stderr, "read_matrix: %s\n", slu_tpu_last_error());
        return 1;
    }
    int64_t n = slu_tpu_n(h);
    printf("n = %lld\n", (long long)n);

    int info = slu_tpu_factor(h, "{\"dtype\": \"float32\"}");
    if (info != 0) {
        fprintf(stderr, "factor info=%d: %s\n", info, slu_tpu_last_error());
        return 1;
    }

    double sign_re, sign_im, logabs;
    slu_tpu_logdet(h, &sign_re, &sign_im, &logabs);
    printf("log|det A| = %.6f (sign %+.0f)\n", logabs, sign_re);

    /* b = A * ones, then solve A x = b with iterative refinement */
    double *ones = (double *)malloc(n * sizeof(double));
    double *b = (double *)malloc(n * sizeof(double));
    for (int64_t i = 0; i < n; ++i) ones[i] = 1.0;
    slu_tpu_matvec(h, ones, b);
    if (slu_tpu_solve(h, b, 1, /*trans=*/0, /*refine=*/1) != 0) {
        fprintf(stderr, "solve: %s\n", slu_tpu_last_error());
        return 1;
    }
    double maxerr = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        double e = fabs(b[i] - 1.0);
        if (e > maxerr) maxerr = e;
    }
    printf("max |x - 1| = %.3e\n", maxerr);

    slu_tpu_free(h);
    free(ones);
    free(b);
    return maxerr < 1e-4 ? 0 : 1;
}
