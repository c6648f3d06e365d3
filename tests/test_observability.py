"""Profiling tables and the parameter-scan (evaluation) mode."""

import numpy as np

from ddalphaamg_tpu import config
from ddalphaamg_tpu.evaluation import ScanConfig, run_scan, scan_values
from ddalphaamg_tpu.profiling import FLOPS_FINE_FULL, Profiler


def test_profiler_table():
    prof = Profiler(enabled=True, sync=False)
    with prof.region("fine_op", level=0, flops=FLOPS_FINE_FULL * 256):
        sum(range(1000))
    with prof.region("fine_op", level=0, flops=FLOPS_FINE_FULL * 256):
        sum(range(1000))
    with prof.region("coarse_op", level=1, flops=1000.0):
        pass
    tab = prof.table()
    assert "fine_op" in tab and "coarse_op" in tab
    assert prof.entries[(0, "fine_op")].count == 2
    prof.reset()
    assert "no data" in prof.table()


def test_profiler_disabled_is_noop():
    prof = Profiler(enabled=False)
    with prof.region("x", flops=1.0):
        pass
    assert not prof.entries


def test_scan_values():
    sc = ScanConfig(start_val=1, end_val=5, step_size=2)
    assert scan_values(sc) == [1, 3, 5]
    sc = ScanConfig(start_val=1, end_val=8, step_size=2, multiplicative=True)
    assert scan_values(sc) == [1, 2, 4, 8]
    sc = ScanConfig(start_val=4, end_val=1, step_size=-1.5)
    assert scan_values(sc) == [4, 2.5, 1.0]


def test_run_scan_e2e(conf4, capsys):
    """Scan d0 setup iter over {1, 2} on the 4^4 config (reference
    'evaluation: 1' mode)."""
    ini = """
d0 global lattice: 4 4 4 4
d0 block lattice: 2 2 2 2
d0 test vectors: 6
d0 setup iter: 1
number of levels: 2
method: 2
interpolation: 2
evaluation: 1
scan variable: d0 setup iter
start value: 1
end value: 2
step size: 1
multiplicative: 0
"""
    p = config.parse_ini(ini)
    p.configuration = conf4
    assert p.evaluation and p.scan_variable == "d0 setup iter"
    sc = ScanConfig(scan_variable=p.scan_variable, start_val=p.start_val,
                    end_val=p.end_val, step_size=p.step_size)
    rows = run_scan(p, sc)
    assert len(rows) == 2
    assert all(r.relres < 1e-9 for r in rows)
    out = capsys.readouterr().out
    assert "d0 setup iter" in out
