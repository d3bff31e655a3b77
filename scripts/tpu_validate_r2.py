"""Round-2 TPU validation: bench (two scales) + weighted collab epoch timing.

ONE long-lived process (axon relay protocol — see .claude/skills/verify):
the first device op waits out any grant wedge; progress streams unbuffered
to the log passed as argv[1].
"""

import json
import sys
import time

LOG = open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_validate_r2.log",
           "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


def main():
    import jax

    log(f"backend probe starting (devices may wait on the relay grant)...")
    t0 = time.time()
    import jax.numpy as jnp

    x = jnp.ones((8, 8))
    v = float(jnp.sum(x @ x))
    log(f"probe ok in {time.time() - t0:.1f}s: backend={jax.default_backend()} "
        f"devices={jax.devices()} sum={v}")

    # --- bench.py, both scales (exactly what the driver runs) -------------
    import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
    import bench

    log("bench: building warm problem...")
    ei, xw = bench.build_problem(bench.WARM)
    log("bench: warm TPU...")
    t0 = time.time()
    warm_tpu = bench.bench_tpu(bench.WARM, ei, xw)
    log(f"warm TPU: {warm_tpu:,.0f} edges/s ({time.time() - t0:.0f}s incl compile)")

    log("bench: building cold (collab-shape) problem...")
    t0 = time.time()
    ei_c, xc = bench.build_problem(bench.COLD)
    log(f"cold problem built in {time.time() - t0:.0f}s: E={ei_c.shape[1]:,}")
    log("bench: cold TPU...")
    t0 = time.time()
    cold_tpu = bench.bench_tpu(bench.COLD, ei_c, xc)
    log(f"cold TPU: {cold_tpu:,.0f} edges/s ({time.time() - t0:.0f}s incl compile)")

    log("bench: warm CPU baseline (3 samples)...")
    warm_cpu, warm_info = bench._cpu_baseline(bench.WARM, ei, xw,
                                              bench.PINNED_CPU_WARM, k=3)
    log(f"warm CPU: {warm_info}")
    log("bench: cold CPU baseline (1 sample)...")
    cold_cpu, cold_info = bench._cpu_baseline(bench.COLD, ei_c, xc,
                                              bench.PINNED_CPU_COLD, k=1)
    log(f"cold CPU: {cold_info}")
    log(json.dumps({
        "warm": {"value": round(warm_tpu, 1),
                 "vs_baseline": round(warm_tpu / warm_cpu, 2)},
        "cold": {"value": round(cold_tpu, 1),
                 "vs_baseline": round(cold_tpu / cold_cpu, 2)},
    }))

    # --- weighted collab-scale teacher epoch (new this round) -------------
    import numpy as np

    from llp_tpu.core import build_graph
    from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum
    from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn

    log("weighted collab-scale teacher: building weighted graph...")
    rng = np.random.default_rng(0)
    w = rng.integers(1, 6, size=ei_c.shape[1]).astype(np.float32)
    gw = build_graph(ei_c, bench.COLD["n"], edge_weight=w)
    t0 = time.time()
    prepare_segsum(gw, weighted=True)
    log(f"weighted segsum layouts built in {time.time() - t0:.0f}s")
    e = ei_c.shape[1]
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=0.0,
        num_nodes=bench.COLD["n"], num_pos_edges=e,
        link_batch_size=bench.COLD["batch"], neg_mode="uniform", lr=0.005,
        spmm_impl="segsum", epochs_per_call=1,
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=bench.COLD["dim"],
        hidden_channels=bench.COLD["hidden"],
        num_layers=bench.COLD["layers"], predictor_mode="mlp",
    )
    opt_state = tx.init(params)
    xd = jnp.asarray(xc)
    pos = jnp.asarray(ei_c.T.astype(np.int32))
    nk = jnp.zeros((1,), jnp.int32)

    def run_one(key0):
        t0 = time.time()
        p2, o2, loss = epoch_fn(params, opt_state, jax.random.PRNGKey(key0),
                                gw, xd, pos, nk)
        lv = float(loss) + float(p2["encoder"]["convs"][0]["lin_l"]["w"][0, 0])
        return time.time() - t0, p2, o2, lv

    dt, params, opt_state, lv = run_one(1)
    log(f"weighted epoch compile+run: {dt:.1f}s")
    dt, params, opt_state, lv = run_one(2)
    steps = -(-e // bench.COLD["batch"])
    log(f"weighted collab-scale teacher epoch: {dt:.2f}s "
        f"({2 * e / dt:,.0f} edges/s, {1000 * dt / steps:.0f} ms/step, "
        f"loss witness {lv:.4f})")
    log("DONE")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # log the failure; the log is the artifact
        import traceback

        log("FAILED: " + repr(e))
        log(traceback.format_exc())
        raise
