"""Fine-grain profiling — the SCT_t / xprof analog.

The reference attributes time to ~80 fine-grain counters inside the
factorization (SCT_t, reference: SRC/include/util_dist.h:198-324) because
its kernels are host-driven loops. Here the factorization is a handful of
fused device programs, so the native TPU equivalent is:

- **xprof traces**: set ``SLU_TPU_XPROF=/path/to/dir`` and every phase of
  every solve in the process is captured into a TensorBoard-compatible
  trace (one ``jax.profiler`` session, stopped at interpreter exit). Each
  driver phase appears as a named trace span, and within it the Mosaic
  kernels / XLA modules carry their own op-level timing — strictly more
  detail than SCT's counters. Requires a working profiler backend for
  the platform (some tunneled/plugin device setups hang in
  ``start_trace``; the annotations themselves are backend-free).
- **named scopes**: phases are wrapped in ``jax.named_scope`` so XLA op
  names in any profile (xprof, ``jax.profiler.device_memory_profile``)
  carry the solver phase they belong to.
- **static schedule counters**: per-level structure histograms recorded
  into ``Stats.counters`` at plan time (``record_schedule_counters``) —
  the static analog of SCT's per-level times, knowable before execution.
"""

from __future__ import annotations

import atexit
import contextlib
import os

import numpy as np

_trace_started = False


def _maybe_start_xprof():
    """Start a process-wide profiler trace if SLU_TPU_XPROF is set."""
    global _trace_started
    if _trace_started:
        return
    logdir = os.environ.get("SLU_TPU_XPROF", "")
    if not logdir:
        return
    import jax
    jax.profiler.start_trace(logdir)
    _trace_started = True

    def _stop():
        global _trace_started
        if _trace_started:
            jax.profiler.stop_trace()
            _trace_started = False

    atexit.register(_stop)


@contextlib.contextmanager
def annotate(name: str):
    """xprof trace span + XLA named scope for one solver phase.

    ``Stats.phase`` wraps every phase in this automatically, so any
    profile taken of a solve carries the solver phase names with no
    call-site changes. No-op-cheap when no trace is active.
    """
    import jax
    _maybe_start_xprof()
    with jax.profiler.TraceAnnotation(f"slu:{name}"):
        with jax.named_scope(f"slu_{name}"):
            yield


def record_schedule_counters(stat, plan) -> None:
    """Static per-level schedule histograms (SCT per-level analog).

    Recorded once per plan: number of elimination levels, blocks and GEMM
    jobs per level (min/mean/max), and the critical-path share — the
    fraction of sequential steps that the level-batched executors cannot
    parallelize away.
    """
    try:
        step_level = np.asarray(plan.step_level)
        g_ptr = np.asarray(plan.g_ptr)
        nlvl = int(step_level.max()) + 1 if len(step_level) else 0
        steps_per_lvl = np.bincount(step_level, minlength=nlvl)
        gemm_per_step = np.diff(g_ptr)
        gemm_per_lvl = np.zeros(nlvl)
        np.add.at(gemm_per_lvl, step_level, gemm_per_step)
        c = stat.counters
        c["sched_levels"] = nlvl
        c["sched_steps_per_level_max"] = float(steps_per_lvl.max())
        c["sched_steps_per_level_mean"] = float(steps_per_lvl.mean())
        c["sched_gemms_total"] = float(gemm_per_lvl.sum())
        c["sched_gemms_per_level_max"] = float(gemm_per_lvl.max())
        # critical path share: levels with a single step serialize fully
        c["sched_serial_levels"] = float((steps_per_lvl == 1).sum())
    except Exception:
        pass
