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
        "teacher_warm_edges_per_sec",
        "teacher_cold_edges_per_sec",
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


def test_teacher_gates_flip_on_regression():
    """The round-5 absolute floors: a healthy session passes, a regressed
    teacher rate (e.g. the 2.25x-slower XLA SpMM fallback) fails the gate."""
    healthy = bench.teacher_gates(9.0e6, 714e3)
    assert all(v["ok"] for v in healthy.values())
    # warm regression (XLA-fallback scale: ~4M) with cold healthy
    g = bench.teacher_gates(4.0e6, 714e3)
    assert not g["teacher_warm_edges_per_sec"]["ok"]
    assert g["teacher_cold_edges_per_sec"]["ok"]
    # cold regression alone
    g = bench.teacher_gates(9.0e6, 300e3)
    assert g["teacher_warm_edges_per_sec"]["ok"]
    assert not g["teacher_cold_edges_per_sec"]["ok"]
    # floors sit below the documented session-variance band of the records
    assert bench.GATE_FLOORS["teacher_warm_edges_per_sec"] < 0.97 * 8.88e6
    assert bench.GATE_FLOORS["teacher_cold_edges_per_sec"] < 0.97 * 714.1e3


def test_help_and_dry_run_never_touch_a_backend():
    """`python bench.py --help` / `--dry-run` must exit without initializing
    any jax backend (on axon, backend init = opening a TPU session — the
    documented relay-wedging foot-gun, VERDICT r4 weak #6)."""
    import subprocess
    import sys

    # The axon sitecustomize imports jax in EVERY interpreter, so "jax not
    # imported" is unassertable; the hazard is backend INIT (that is what
    # opens the TPU session).  xla_bridge._backends stays empty until then.
    prog = (
        "import sys, bench\n"
        "try:\n"
        "    bench._parse_args(['--help'])\n"
        "except SystemExit:\n"
        "    pass\n"
        "sys.argv = ['bench.py', '--dry-run']\n"
        "bench.main()\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, 'bench guard initialized a backend'\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", prog], cwd="/root/repo",
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert '"dry_run": true' in r.stdout


def test_bench_tpu_encoder_matrix_paths_run():
    """The record-only encoder-matrix rows (gcn, sage_updated) reuse
    bench_tpu with encoder kwargs — keep those paths import/shape-safe."""
    spec = _tiny_spec()
    ei, x = bench.build_problem(spec)
    assert bench.bench_tpu(spec, ei, x, encoder="gcn") > 0
    assert bench.bench_tpu(spec, ei, x, encoder="sage",
                           conv="sage_updated") > 0
