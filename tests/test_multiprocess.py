"""TRUE multi-process validation of the distributed path.

Everything else in the suite runs shard_map on a single-process 8-device
virtual mesh; this test launches TWO separate Python processes wired
together with ``initialize_multihost`` (jax.distributed + Gloo CPU
collectives, 4 virtual devices each), runs the DP teacher step over the
resulting 2-process x 4-device GLOBAL mesh, and checks the loss trajectory
matches the single-process 8-device mesh bit-for-float.  This exercises what
the in-process tests cannot: cross-process collective transport, global-array
construction from per-process shards, and consistent RNG fold_in across a
real process boundary — the closest this environment gets to the 2-host
scaling setup (multi-host hardware is not available; SURVEY §2.3).

The module doubles as the worker executable:
``python tests/test_multiprocess.py worker <pid> <port> <out.npy>``.
jax imports stay function-local so workers can configure platform/devices
before first import.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np

N, DIM, HID, B, STEPS = 96, 16, 16, 32, 3
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _problem():
    rng = np.random.default_rng(7)
    m = 240
    src = rng.integers(0, N, size=m).astype(np.int64)
    dst = rng.integers(0, N, size=m).astype(np.int64)
    in_deg = np.bincount(dst, minlength=N).astype(np.float32)
    x = rng.normal(size=(N, DIM)).astype(np.float32)
    pos = rng.integers(0, N, size=(B, 2)).astype(np.int32)
    neg = rng.integers(0, N, size=(B, 2)).astype(np.int32)
    return src, dst, in_deg, x, pos, neg


def _run_trajectory(mesh):
    """3 DP teacher steps on ``mesh`` (single- OR multi-process global mesh);
    returns the per-step losses.  dropout=0.5 on purpose: the device-folded
    mask keys must agree between process topologies."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from llp_tpu.parallel.sharded import make_sharded_teacher_step
    from llp_tpu.train.teacher import init_teacher_params

    src, dst, in_deg, x, pos, neg = _problem()

    def put(host, spec, dtype):
        host = np.asarray(host, dtype)
        return jax.make_array_from_callback(
            host.shape, NamedSharding(mesh, spec), lambda idx: host[idx]
        )

    senders = put(src, P("data"), np.int32)
    receivers = put(dst, P("data"), np.int32)
    emask = put(np.ones(len(src), bool), P("data"), bool)
    in_degd = put(in_deg, P(), np.float32)
    xd = put(x, P(), np.float32)
    posd = put(pos, P("data"), np.int32)
    negd = put(neg, P("data"), np.int32)
    bmask = put(np.ones(B, bool), P("data"), bool)

    step_fn, tx = make_sharded_teacher_step(
        mesh, num_nodes=N, dropout=0.5, lr=0.01
    )
    params = jax.tree_util.tree_map(
        lambda a: put(np.asarray(a), P(), a.dtype),
        init_teacher_params(
            jax.random.PRNGKey(0), encoder="sage", in_channels=DIM,
            hidden_channels=HID, num_layers=2, predictor_mode="mlp",
        ),
    )
    opt_state = tx.init(params)
    losses = []
    for i in range(STEPS):
        params, opt_state, loss = step_fn(
            params, opt_state, jax.random.PRNGKey(100 + i), senders,
            receivers, emask, in_degd, xd, posd, negd, bmask,
        )
        losses.append(float(loss))  # replicated scalar: addressable anywhere
    return losses


def _run_halo_trajectory(mesh):
    """2 halo (feature-sharded) teacher EPOCHS on ``mesh``: the all_to_all
    boundary exchange crosses a REAL process boundary on the 2-process
    global mesh — the strongest halo-path evidence available without
    multi-chip hardware."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from llp_tpu.core import build_graph
    from llp_tpu.parallel.epoch import make_halo_teacher_epoch_fn
    from llp_tpu.parallel.halo import build_halo_partition, pad_nodes
    from llp_tpu.train.teacher import init_teacher_params

    src, dst, in_deg, x, pos, _ = _problem()
    graph = build_graph(np.stack([src, dst]), N)
    part = build_halo_partition(graph, 8)

    def put(host, spec, dtype):
        host = np.asarray(host, dtype)
        return jax.make_array_from_callback(
            host.shape, NamedSharding(mesh, spec), lambda idx: host[idx]
        )

    xs = put(np.asarray(pad_nodes(x, part)), P("data"), np.float32)
    degs = put(
        np.asarray(pad_nodes(np.asarray(graph.in_degree), part)),
        P("data"), np.float32,
    )
    posd = put(pos, P("data"), np.int32)
    dummy = put(np.zeros(1, np.int32), P(), np.int32)

    hep_fn, tx = make_halo_teacher_epoch_fn(
        mesh, part, dropout=0.0, num_nodes=N, num_pos_edges=B,
        link_batch_size=B, neg_mode="uniform", lr=0.01,
    )
    params = jax.tree_util.tree_map(
        lambda a: put(np.asarray(a), P(), a.dtype),
        init_teacher_params(
            jax.random.PRNGKey(1), encoder="sage", in_channels=DIM,
            hidden_channels=HID, num_layers=2, predictor_mode="mlp",
        ),
    )
    opt_state = tx.init(params)
    losses = []
    for i in range(2):
        params, opt_state, loss = hep_fn(
            params, opt_state, jax.random.PRNGKey(200 + i), xs, degs, posd,
            dummy,
        )
        losses.append(float(loss))
    return losses


def _run_table_student_trajectory(mesh):
    """2 TABLE-SHARDED student epochs on ``mesh``: x and the teacher table
    are OWNER-SHARDED across the 2-process global mesh, so every
    feature/teacher gather (table_gather: all_gather indices -> masked
    local gathers -> psum_scatter) crosses a real process boundary.  With
    the halo epoch this is the second surface whose static collective plan
    is most likely to break across processes (VERDICT r4 ask #3)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from llp_tpu.core import build_graph
    from llp_tpu.models.predictor import init_link_predictor
    from llp_tpu.parallel.epoch import make_sharded_student_epoch_fn
    from llp_tpu.train.student import init_student_params

    src, dst, in_deg, x, pos, _ = _problem()
    graph = build_graph(np.stack([src, dst]), N)
    rng = np.random.default_rng(21)
    t_h = rng.normal(size=(N, HID)).astype(np.float32)

    def put(host, spec, dtype):
        host = np.asarray(host, dtype)
        return jax.make_array_from_callback(
            host.shape, NamedSharding(mesh, spec), lambda idx: host[idx]
        )

    put_repl = lambda a: put(np.asarray(a), P(), np.asarray(a).dtype)
    graph_g = jax.tree_util.tree_map(put_repl, graph)
    # owner-sharded tables (N=96 divides the 8-device mesh: no pad rows;
    # padded owner rows are covered by the single-process n=201 test)
    x_tab = put(x, P("data"), np.float32)
    t_h_tab = put(t_h, P("data"), np.float32)
    posd = put(pos, P(), np.int32)
    dummy = put(np.zeros(1, np.int32), P(), np.int32)

    ep_fn, tx = make_sharded_student_epoch_fn(
        mesh, num_nodes=N, num_pos_edges=B, link_batch_size=B,
        node_batch_size=16, predictor_mode="mlp", dropout=0.0, lr=0.01,
        true_label=0.5, llp_d=1.0, llp_r=1.0, rw_step=2, hops=1, ns_rate=1,
        neg_mode="uniform", minibatch=True, feature_sharding="table",
    )
    tpred = jax.tree_util.tree_map(
        put_repl,
        init_link_predictor(jax.random.PRNGKey(4), "mlp", HID, HID, 1, 2),
    )
    params = jax.tree_util.tree_map(
        put_repl,
        init_student_params(
            jax.random.PRNGKey(2), in_channels=DIM, hidden_channels=HID,
            num_layers=2, predictor_mode="mlp",
        ),
    )
    opt_state = tx.init(params)
    losses = []
    for i in range(2):
        params, opt_state, loss = ep_fn(
            params, opt_state, jax.random.PRNGKey(300 + i), graph_g, x_tab,
            t_h_tab, tpred, posd, dummy,
        )
        losses.append(float(loss))
    return losses


def _worker(pid: int, port: int, out: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from llp_tpu.parallel.multihost import initialize_multihost

    initialize_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.device_count() == 8 and jax.local_device_count() == 4
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    losses = (_run_trajectory(mesh) + _run_halo_trajectory(mesh)
              + _run_table_student_trajectory(mesh))
    if pid == 0:
        np.save(out, np.asarray(losses))


def test_two_process_dp_teacher_matches_single_process(tmp_path):
    import jax
    import pytest
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    out = str(tmp_path / "mp_losses.npy")
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=_REPO + os.pathsep + env.get("PYTHONPATH", ""),
        # disable the persistent compilation cache in the workers: two
        # processes racing one dir (inherited from conftest) can corrupt it
        JAX_COMPILATION_CACHE_DIR="",
    )
    # NB: the port was probed-then-released above — a tiny TOCTOU window
    # remains, acceptable for a test (the bind happens within milliseconds).
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker",
             str(pid), str(port), out],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
        assert p.returncode == 0, f"worker failed:\n{stdout[-3000:]}"

    got = np.load(out)
    mesh1 = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    ref = (_run_trajectory(mesh1) + _run_halo_trajectory(mesh1)
           + _run_table_student_trajectory(mesh1))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-6)


if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[1] == "worker":
        _worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
