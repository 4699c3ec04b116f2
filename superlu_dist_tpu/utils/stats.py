"""Runtime statistics — analog of ``SuperLUStat_t`` + ``PStatPrint``.

(reference: SRC/include/util_dist.h:101-135, SRC/prec-independent/util.c:380-480;
fine-grain SCT counters util_dist.h:198-324.)

Phases mirror ``PhaseType`` (superlu_enum_consts.h:66-90). Use::

    stat = Stats()
    with stat.phase("FACT"):
        ...
    stat.ops["FACT"] += flops
    print(stat.report())
"""

from __future__ import annotations

import collections
import contextlib
import time


PHASES = (
    "COLPERM", "ROWPERM", "EQUIL", "ETREE", "SYMBFAC", "DIST",
    "FACT", "COMM", "SOL_COMM", "RCOND", "SOLVE", "REFINE",
)


class Stats:
    """Per-solve phase timers, op counts, and solver counters."""

    def __init__(self):
        self.utime = collections.defaultdict(float)     # seconds per phase
        self.ops = collections.defaultdict(float)       # flops per phase
        self.tiny_pivots = 0          # ReplaceTinyPivot count (pdgstrf2.c)
        self.refine_steps = 0         # RefineSteps (pdgsrfs.c)
        self.peak_buffer_bytes = 0    # peak device pool bytes
        self.counters = collections.defaultdict(float)  # misc (fill ratio, ...)

    @contextlib.contextmanager
    def phase(self, name: str):
        try:
            from .profiling import annotate
            ann = annotate(name)     # xprof span + XLA named scope
        except Exception:            # no jax in this process
            ann = contextlib.nullcontext()
        t0 = time.perf_counter()
        try:
            with ann:
                yield self
        finally:
            self.utime[name] += time.perf_counter() - t0

    def report(self) -> str:
        """Analog of ``PStatPrint`` (util.c:380-480)."""
        lines = ["**************************************************",
                 "**** Time (seconds) ****"]
        for ph in PHASES:
            if ph in self.utime:
                line = f"    {ph:<10}: {self.utime[ph]:12.6f}"
                if self.ops.get(ph):
                    mflop = self.ops[ph] / max(self.utime[ph], 1e-12) / 1e6
                    line += f"    Mflops: {mflop:12.2f}"
                lines.append(line)
        total = sum(self.utime.values())
        lines.append(f"    {'TOTAL':<10}: {total:12.6f}")
        lines.append(f"    tiny pivots replaced: {self.tiny_pivots}")
        lines.append(f"    refinement steps:     {self.refine_steps}")
        if self.peak_buffer_bytes:
            lines.append(
                f"    peak device pool:     {self.peak_buffer_bytes/2**20:.2f} MiB")
        for k in sorted(self.counters):
            v = self.counters[k]
            lines.append(f"    {k}: {v:g}" if isinstance(v, (int, float))
                         else f"    {k}: {v}")
        lines.append("**************************************************")
        return "\n".join(lines)

    def merge(self, other: "Stats") -> None:
        for k, v in other.utime.items():
            self.utime[k] += v
        for k, v in other.ops.items():
            self.ops[k] += v
        self.tiny_pivots += other.tiny_pivots
        self.refine_steps = max(self.refine_steps, other.refine_steps)
        self.peak_buffer_bytes = max(self.peak_buffer_bytes,
                                     other.peak_buffer_bytes)
        for k, v in other.counters.items():
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                self.counters[k] += v
            else:
                # string-valued counters (gemm_precision, adapt_*):
                # last writer wins — summing them is a TypeError
                self.counters[k] = v
