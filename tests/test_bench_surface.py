"""Guard the driver-facing bench surface (bench.py) against bitrot.

The round driver runs ``python bench.py`` unattended at round end; a broken
import or a signature drift in the epoch-fn plumbing would silently cost
the round its metric.  These tests run the same code paths at toy scale on
CPU (the real measurements are TPU-only and env-gated in bench.main)."""

import numpy as np

import bench


def _tiny_spec():
    return dict(n=400, k=4, deg=5.0, dim=16, hidden=16, layers=2,
                batch=1024, epochs_per_call=2, seed=3)


def test_build_problem_shapes():
    spec = _tiny_spec()
    ei, x = bench.build_problem(spec)
    assert ei.shape[0] == 2 and ei.dtype == np.int64
    assert x.shape == (spec["n"], spec["dim"])


def test_bench_tpu_teacher_path_runs():
    spec = _tiny_spec()
    ei, x = bench.build_problem(spec)
    rate = bench.bench_tpu(spec, ei, x)
    assert rate > 0


def test_bench_student_path_runs():
    spec = _tiny_spec()
    spec["epochs_per_call"] = 1
    ei, x = bench.build_problem(spec)
    rate = bench.bench_student(spec, ei, x)
    assert rate > 0


def test_gate_floors_well_formed():
    assert set(bench.GATE_FLOORS) == {
        "student_bf16_edges_per_sec",
        "inner_approx_235k_ms",
        "inner_exact_235k_ms",
        "mlp_approx_235k_ms",
        "inner_approx_10m_int8_ms",
        "mlp_approx_10m_int8_ms",
        "inner_approx_10m_int4_ms",
        "daemon_conc8_rps",
    }
    assert all(v > 0 for v in bench.GATE_FLOORS.values())
