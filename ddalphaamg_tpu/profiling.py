"""Profiling and solve observability (reference PROFILING subsystem:
PROF_PRECISION_START/STOP macros src/main_pre_def_generic.h:101-122, kernel
class table src/init_generic.c:24-96, printout src/solver_analysis.c:65-89).

TPU adaptation: device execution is asynchronous, so per-kernel host timers
would measure dispatch, not compute.  The profiler therefore records
  * wall time per region with an optional device sync at region exit
    (sync=True regions bracket whole solver phases, where one sync is
    amortized and accurate);
  * call counts;
  * analytic flop counts from the reference's flop models
    (src/init_generic.c:58-68), so flop/s uses modeled work like the
    reference does.

Usage:
    prof = Profiler(enabled=True)
    with prof.region("fine_op", level=0, flops=1920 * volume):
        eta = d_plus_clover(op, phi)
    print(prof.table())

A module-level PROF instance is used by the solver stack when
profiling is switched on (api.Solver(params, profile=True) or
DDAAMG_PROFILE=1).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field


# reference flop models per lattice site (src/init_generic.c:58-68)
FLOPS_FINE_SELF = 552          # clover (self-coupling)
FLOPS_FINE_NEIGHBOR = 1368     # hopping
FLOPS_FINE_FULL = FLOPS_FINE_SELF + FLOPS_FINE_NEIGHBOR


def flops_coarse_self(n2: int) -> int:
    """Coarse self-coupling flops/site; n2 = 2 * num_eig_vect."""
    return 8 * n2 * n2


def flops_coarse_neighbor(n2: int) -> int:
    return 8 * 8 * n2 * n2


@dataclass
class _Entry:
    time: float = 0.0
    count: int = 0
    flops: float = 0.0


@dataclass
class Profiler:
    enabled: bool = False
    sync: bool = True
    entries: dict = field(default_factory=lambda: defaultdict(_Entry))

    def reset(self):
        self.entries.clear()

    @contextmanager
    def region(self, name: str, level: int = 0, flops: float = 0.0,
               sync_val=None):
        """Time a region; sync_val (a jax array/pytree) is block_until_ready'd
        at exit when syncing is on."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if self.sync and sync_val is not None:
            import jax
            jax.block_until_ready(sync_val)
        e = self.entries[(level, name)]
        e.time += time.perf_counter() - t0
        e.count += 1
        e.flops += flops

    def add(self, name: str, level: int, dt: float, flops: float = 0.0,
            count: int = 1):
        if not self.enabled:
            return
        e = self.entries[(level, name)]
        e.time += dt
        e.count += count
        e.flops += flops

    def table(self) -> str:
        """Reference-style per-level profiling table
        (src/init_generic.c:84-96)."""
        if not self.entries:
            return "| profiling: no data |"
        lines = []
        lines.append("+----------------------------------------------------------------------+")
        lines.append("| kernel (per level)              |   count |  time (s) |     GFLOP/s |")
        lines.append("+----------------------------------------------------------------------+")
        total_t = 0.0
        total_f = 0.0
        for (level, name), e in sorted(self.entries.items()):
            gfs = e.flops / e.time / 1e9 if e.time > 0 and e.flops else 0.0
            lines.append(f"| depth {level}: {name:<22s} | {e.count:7d} | {e.time:9.4f} |"
                         f" {gfs:11.2f} |")
            total_t += e.time
            total_f += e.flops
        lines.append("+----------------------------------------------------------------------+")
        gfs = total_f / total_t / 1e9 if total_t > 0 else 0.0
        lines.append(f"| total                           |         | {total_t:9.4f} |"
                     f" {gfs:11.2f} |")
        lines.append("+----------------------------------------------------------------------+")
        return "\n".join(lines)


PROF = Profiler(enabled=bool(os.environ.get("DDAAMG_PROFILE")))
