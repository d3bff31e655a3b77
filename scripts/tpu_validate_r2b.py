"""Round-2 TPU session B: cora-standin quality-band reconfirmation after the
round-2 changes + collab-scale daemon CROSS-REQUEST BATCHING benchmark.

One long-lived process (axon protocol); unbuffered log to argv[1].
"""

import json
import sys
import time

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root  # background shells don't inherit the cwd

LOG = open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_validate_r2b.log",
           "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


def quality():
    from llp_tpu.train.loop import run_student, run_teacher
    from llp_tpu.utils.config import StudentConfig, TeacherConfig

    tmp = "/tmp/llp-r2-cora"
    t0 = time.time()
    t = TeacherConfig(
        datasets="cora", dataset_dir=tmp, runs=3, epochs=200, eval_steps=1,
        patience=100, hidden_channels=256, batch_size=64 * 1024,
        save_dir=tmp + "/saved", results_dir=tmp + "/results", log_steps=1000,
    )
    st, _ = run_teacher(t, verbose=False)
    log(f"teacher cora-standin ({time.time() - t0:.0f}s): "
        f"Hits@20 {st['Hits@20']} AUC {st['AUC']}")
    t0 = time.time()
    s = StudentConfig(
        datasets="cora", dataset_dir=tmp, runs=3, epochs=200, eval_steps=1,
        patience=100, hidden_channels=256, link_batch_size=64 * 1024,
        save_dir=tmp + "/saved", results_dir=tmp + "/results", log_steps=1000,
    )
    ss, _ = run_student(s, verbose=False)
    log(f"student cora-standin ({time.time() - t0:.0f}s): "
        f"Hits@20 {ss['Hits@20']} AUC {ss['AUC']}")


def daemon_batching():
    import concurrent.futures
    import urllib.request

    import jax
    import jax.numpy as jnp
    import numpy as np

    from llp_tpu.models.predictor import init_link_predictor
    from llp_tpu.serve.server import BackgroundServer, ServingState

    n, h_dim = 235_868, 256
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (n, h_dim), jnp.float32)
    params = init_link_predictor(jax.random.fold_in(key, 1), "inner",
                                 h_dim, h_dim, 1, 2)
    state = ServingState(params, h, mode="inner", block=16384, approx=True,
                         compute_dtype=jnp.bfloat16)
    q_per, k, n_req = 16, 10, 24
    rng = np.random.default_rng(0)
    reqs = [rng.integers(0, n, size=q_per).tolist() for _ in range(n_req)]

    with BackgroundServer(state, max_queue=64) as srv:
        def post(queries):
            r = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/v1/topk",
                data=json.dumps({"queries": queries, "k": k}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(r, timeout=600) as resp:
                return json.loads(resp.read())

        # Warm both program buckets: the single-request bucket (16) and the
        # merged-batch buckets up to 8 requests (128).
        t0 = time.time()
        post(reqs[0])
        log(f"warmup bucket {q_per}: {time.time() - t0:.1f}s")
        t0 = time.time()
        post(rng.integers(0, n, size=8 * q_per).tolist())
        log(f"warmup bucket {8 * q_per}: {time.time() - t0:.1f}s")
        for m in (2, 4):  # intermediate merge buckets
            post(rng.integers(0, n, size=m * q_per).tolist())

        t0 = time.time()
        for q in reqs:
            post(q)
        seq = time.time() - t0
        import urllib.request as _u

        with _u.urlopen(f"http://127.0.0.1:{srv.port}/healthz", timeout=60) as r:
            calls_seq = json.loads(r.read())["device_calls"]
        log(f"sequential: {n_req} reqs in {seq:.2f}s = {n_req / seq:.1f} req/s "
            f"({1000 * seq / n_req:.1f} ms/req)")

        t0 = time.time()
        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            list(ex.map(post, reqs))
        conc = time.time() - t0
        with _u.urlopen(f"http://127.0.0.1:{srv.port}/healthz", timeout=60) as r:
            calls_conc = json.loads(r.read())["device_calls"] - calls_seq
        log(f"concurrent x8: {n_req} reqs in {conc:.2f}s = "
            f"{n_req / conc:.1f} req/s ({1000 * conc / n_req:.1f} ms/req), "
            f"device calls {calls_conc} (batching factor "
            f"{n_req / max(calls_conc, 1):.1f}x), speedup {seq / conc:.2f}x")


def main():
    import jax

    log("probe...")
    t0 = time.time()
    import jax.numpy as jnp

    float(jnp.sum(jnp.ones((4, 4))))
    log(f"probe ok in {time.time() - t0:.1f}s backend={jax.default_backend()}")
    log("--- daemon cross-request batching (collab-scale table) ---")
    daemon_batching()
    log("--- cora-standin quality bands ---")
    quality()
    log("DONE")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        import traceback

        log("FAILED: " + repr(e))
        log(traceback.format_exc())
        raise
