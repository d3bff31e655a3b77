"""Round-5 diagnostic: WHY does the 10M-teacher compile fail?

One process, one host build; then a ladder of compile probes with FULL
error capture:
  A. single spmm fwd (arg-path, chunked) at 91M edges
  B. spmm fwd+bwd grad
  C. one teacher train step (no epoch scan)
  D. teacher epoch scan at bl=2^19
  E. epoch with LLP_SEGSUM_CHUNK_BYTES=2GB (half the chunk count)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe10m_compile.py <log>
"""

import os
import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe10m.log"
LOG = open(OUT, "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


os.environ.setdefault("LLP_SEGSUM_CHUNK_BYTES", str(1 << 30))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import ml_dtypes  # noqa: E402
import numpy as np  # noqa: E402

log(f"=== probe start; devices: {jax.devices()}")

from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.data.synthetic import community_features  # noqa: E402
from llp_tpu.ops.pallas import segsum_kernel as sk  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import attach_segsum  # noqa: E402
from llp_tpu.ops.spmm import spmm  # noqa: E402
from llp_tpu.train.teacher import (  # noqa: E402
    init_teacher_params,
    make_teacher_epoch_fn,
)

N, D, H = 10_000_000, 64, 128
CACHE = f"/tmp/scale10m_cache_{N}.npz"
t0 = time.time()
with np.load(CACHE) as z:
    ei, comm = z["ei"], z["comm"]
e = ei.shape[1]
x_np = community_features(comm, D, kind="gauss", seed=5)
g = build_graph(ei.astype(np.int64), N)
g = attach_segsum(g)
z1 = jnp.zeros((1,), jnp.int32)
g_t = g.replace(senders=z1, receivers=z1, csr_row=z1,
                edge_mask=jnp.zeros((1,), bool))
del g
xd = jnp.asarray(x_np.astype(ml_dtypes.bfloat16))
pos_edges = jnp.asarray(ei.T.astype(np.int32))
del ei, x_np
log(f"setup in {time.time() - t0:.0f}s (E={e})")


def probe(name, make_lowered):
    t0 = time.time()
    try:
        lowered = make_lowered()
        compiled = lowered.compile()
        ma = None
        try:
            m = compiled.memory_analysis()
            ma = (f"temp={m.temp_size_in_bytes >> 20}MB "
                  f"args={m.argument_size_in_bytes >> 20}MB "
                  f"gen={m.generated_code_size_in_bytes >> 20}MB")
        except Exception:  # noqa: BLE001
            pass
        log(f"probe {name}: OK in {time.time() - t0:.0f}s  {ma}")
        return compiled
    except Exception as ex:  # noqa: BLE001
        log(f"probe {name}: FAILED in {time.time() - t0:.0f}s")
        for line in str(ex).splitlines():
            log(f"  | {line}")
        return None


# A: single spmm fwd
fwd = jax.jit(lambda graph, x: spmm(graph, x, "mean", impl="segsum"))
probe("A spmm-fwd", lambda: fwd.lower(g_t, xd))

# B: fwd+bwd
loss = jax.jit(
    lambda graph, x: jax.grad(
        lambda xx: jnp.sum(spmm(graph, xx, "mean", impl="segsum")
                           .astype(jnp.float32) ** 2)
    )(x)
)
probe("B spmm-grad", lambda: loss.lower(g_t, xd))

# C/D/E: teacher step / epoch
params = init_teacher_params(
    jax.random.PRNGKey(0), encoder="sage", in_channels=D, hidden_channels=H,
    num_layers=2, predictor_mode="mlp",
)
neg_keys = jnp.zeros((1,), jnp.int32)


def epoch_probe(bl, steps_override=None, remat=False, hoist=None,
                donate_x=False):
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=0.0, num_nodes=N,
        num_pos_edges=e if steps_override is None else bl * steps_override,
        link_batch_size=bl, neg_mode="uniform", lr=0.005,
        spmm_impl="segsum", compute_dtype="bfloat16", gather_last=True,
        remat=remat, hoist=hoist, donate_x=donate_x,
    )
    opt_state = tx.init(params)
    pe = pos_edges if steps_override is None else pos_edges[: bl * steps_override]
    return epoch_fn.lower(params, opt_state, jax.random.PRNGKey(1), g_t, xd,
                          pe, neg_keys)


# Scan-chunked round: epoch-level configs, most-preferred first; run ONE
# epoch on the first one that compiles (timing + execution validation).
CONFIGS = [
    ("T1 epoch remat=1 donate_x=1 bl=2^19", dict(remat=True, donate_x=True)),
    ("T2 epoch remat=1 bl=2^19", dict(remat=True)),
    ("T3 epoch remat=1 donate_x=1 bl=2^18",
     dict(remat=True, donate_x=True), 1 << 18),
]
for cfg in CONFIGS:
    name, kw = cfg[0], cfg[1]
    bl = cfg[2] if len(cfg) > 2 else (1 << 19)
    compiled = probe(name, lambda: epoch_probe(bl, **kw))
    if compiled is None:
        continue
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=0.0, num_nodes=N,
        num_pos_edges=e, link_batch_size=bl, neg_mode="uniform", lr=0.005,
        spmm_impl="segsum", compute_dtype="bfloat16", gather_last=True,
        **kw,
    )
    opt_state = tx.init(params)
    dx = kw.get("donate_x", False)
    try:
        xd_l = xd
        p2, o2 = params, opt_state
        for ep in range(1, 3):
            t0 = time.time()
            outs = compiled(p2, o2, jax.random.PRNGKey(ep), g_t, xd_l,
                            pos_edges, neg_keys)
            if dx:
                p2, o2, loss, xd_l = outs
            else:
                p2, o2, loss = outs
            lv = float(loss)
            dt = time.time() - t0
            log(f"{name}: EPOCH{ep} {dt:.1f}s loss={lv:.4f} "
                f"({2 * e / dt / 1e6:.2f}M edges/s)")
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: epoch EXEC failed")
        for line in str(ex).splitlines()[:40]:
            log(f"  | {line}")
    break
log("DONE")
