"""TPU measurement (session 7, part 2): engine-level top_k_partners
exact vs approx vs bf16 — the numbers for BASELINE.md.

Single dispatches are fine at these magnitudes (5-200 ms >> the ~2 ms tunnel
latency); each config is timed twice and the second (cached-executable) run
is reported. Axon relay protocol: one process, line-buffered log (argv[1]).
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_topk2.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.models.mlp import init_mlp  # noqa: E402
from llp_tpu.models.predictor import init_link_predictor  # noqa: E402
from llp_tpu.serve import encode_nodes, top_k_partners  # noqa: E402

N, D, H, Q, K_TOP = 235_000, 256, 256, 256, 10
rng = np.random.default_rng(2)
log(f"devices: {jax.devices()}")
xs = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
enc = init_mlp(jax.random.PRNGKey(0), 2, D, H, H)
h_emb = encode_nodes(enc, xs, block=32768)
_ = float(h_emb[0, 0])
log(f"table ready: N={N} H={H} Q={Q} k={K_TOP}")
qi = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))

preds = {
    "inner": init_link_predictor(jax.random.PRNGKey(1), "inner", H, H, 1, 2),
    "mlp": init_link_predictor(jax.random.PRNGKey(1), "mlp", H, H, 1, 2),
}

exact_ids = {}
for mode in ("inner", "mlp"):
    for approx in (False, True):
        for cd in (None, jnp.bfloat16):
            name = (f"{mode} approx={int(approx)} "
                    f"dtype={'bf16' if cd else 'fp32'}")
            try:
                kw = dict(k=K_TOP, mode=mode, block=16384, approx=approx,
                          compute_dtype=cd)
                vals, ids = top_k_partners(preds[mode], h_emb, qi, **kw)
                _ = float(vals[0, 0])
                t0 = time.perf_counter()
                vals, ids = top_k_partners(preds[mode], h_emb, qi, **kw)
                _ = float(vals[0, 0])
                dt = time.perf_counter() - t0
                log(f"{name}: {dt*1e3:.2f} ms ({Q*N/dt/1e9:.2f} B pairs/s, "
                    f"{dt/Q*1e3:.3f} ms/query)")
                if cd is None:
                    key = (mode, approx)
                    exact_ids[key] = np.asarray(ids)
            except Exception as ex:  # noqa: BLE001
                log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:200]}")

for mode in ("inner", "mlp"):
    a, e = exact_ids.get((mode, True)), exact_ids.get((mode, False))
    if a is not None and e is not None:
        rec = np.mean([
            len(set(a[i].tolist()) & set(e[i].tolist())) / K_TOP
            for i in range(Q)
        ])
        log(f"{mode} approx recall@{K_TOP} vs exact: {rec:.4f}")

log("DONE")
