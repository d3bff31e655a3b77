"""End-to-end serving-daemon latency at collab scale (TPU).

Boots the HTTP daemon (llp_tpu/serve/server.py) over a synthetic
collab-shaped table (N=235,868, H=256) IN-PROCESS and times loopback HTTP
requests — the full deployment path a client sees: JSON parse, bucket pad,
jitted retrieval/scoring, JSON encode.  Engine-only timings for the same
shapes are in BASELINE.md (scripts/bench_topk*.py, bench_scorepairs.py);
the delta is the daemon overhead.

Usage: python scripts/bench_daemon.py <logfile>
"""

import json
import sys
import time
import urllib.request

LOG = open(sys.argv[1], "a", buffering=1) if len(sys.argv) > 1 else sys.stdout


def log(msg):
    LOG.write(msg + "\n")


def post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def time_requests(port, path, payload, iters=20):
    post(port, path, payload)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        post(port, path, payload)
    return (time.perf_counter() - t0) / iters


import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root


def main():
    import jax
    import jax.numpy as jnp

    from llp_tpu.models.predictor import init_link_predictor
    from llp_tpu.serve.server import BackgroundServer, ServingState

    log(f"devices: {jax.devices()}")
    n, hdim = 235_868, 256
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(jax.random.fold_in(key, 1), (n, hdim), jnp.float32)
    float(h[0, 0])
    log(f"table ready: {n}x{hdim} fp32 ({n * hdim * 4 / 1e6:.0f} MB)")

    rng = __import__("numpy").random.default_rng(0)
    queries = rng.integers(0, n, size=256).tolist()
    pairs = rng.integers(0, n, size=(4096, 2)).tolist()

    for mode in ("inner", "mlp"):
        params = init_link_predictor(
            jax.random.fold_in(key, 2), mode, hdim, hdim, 1, 2
        )
        for approx, cdtype, tag in (
            (False, None, "exact fp32"),
            (True, jnp.bfloat16, "approx bf16"),
        ):
            state = ServingState(params, h, mode=mode, block=4096,
                                 approx=approx, compute_dtype=cdtype)
            with BackgroundServer(state) as srv:
                dt = time_requests(srv.port, "/v1/topk",
                                   {"queries": queries, "k": 10})
                log(f"topk  mode={mode:5s} {tag}: {dt * 1e3:8.2f} ms/req "
                    f"(Q=256, k=10; {256 * n / dt / 1e9:.2f} B pairs/s)")
            state = ServingState(params, h, mode=mode, block=4096)
            with BackgroundServer(state) as srv:
                dt = time_requests(srv.port, "/v1/score", {"pairs": pairs})
                log(f"score mode={mode:5s} 4096 pairs: {dt * 1e3:8.2f} ms/req "
                    f"({4096 / dt / 1e6:.2f} M pairs/s)")
    log("done")


if __name__ == "__main__":
    main()
