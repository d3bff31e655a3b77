"""Round-5 diagnostic 7: step count vs permutation size at N=5M.

C3/C4 (1 and 3 steps) pass; the 87-step epoch crashes.  Covariates: number
of scan steps and the size of the in-program epoch permutation (= e).

  D1: bl=2^18, e=30*BL (30 steps)
  D2: bl=2^18, e=60*BL (60 steps)
  D3: bl=2^21, e=full 22.7M (11 steps, full-size permutation)
  D4: bl=2^18, e=full (87 steps) — the known crash, last

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_steps_count.py <log>
"""

import os
import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_steps_count.log"
LOG = open(OUT, "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


os.environ.setdefault("LLP_SEGSUM_CHUNK_BYTES", str(1 << 29))
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import ml_dtypes  # noqa: E402
import numpy as np  # noqa: E402

log(f"=== probe_steps_count start; devices: {jax.devices()}")

from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import attach_segsum  # noqa: E402
from llp_tpu.train.teacher import (  # noqa: E402
    init_teacher_params,
    make_teacher_epoch_fn,
)

N = 5_000_000
with np.load("/tmp/scale10m_cache_10000000.npz") as z:
    EI = z["ei"]
keep = (EI[0] < N) & (EI[1] < N)
ei = EI[:, keep]
del EI
E = ei.shape[1]
t0 = time.time()
g = attach_segsum(build_graph(ei.astype(np.int64), N))
z1 = jnp.zeros((1,), jnp.int32)
g = g.replace(senders=z1, receivers=z1, csr_row=z1,
              edge_mask=jnp.zeros((1,), bool))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N, 64)).astype(ml_dtypes.bfloat16))
pos = jnp.asarray(ei.T.astype(np.int32))
del ei
params0 = init_teacher_params(
    jax.random.PRNGKey(0), encoder="sage", in_channels=64,
    hidden_channels=128, num_layers=2, predictor_mode="mlp",
)
nk = jnp.zeros((1,), jnp.int32)
log(f"setup {time.time() - t0:.0f}s (E={E})")


def rung(name, bl, e_use):
    fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=0.0, num_nodes=N,
        num_pos_edges=e_use, link_batch_size=bl, neg_mode="uniform",
        lr=0.005, spmm_impl="segsum", compute_dtype="bfloat16",
    )
    p = jax.tree_util.tree_map(jnp.copy, params0)
    opt = tx.init(p)
    try:
        t0 = time.time()
        comp = fn.lower(p, opt, jax.random.PRNGKey(1), g, x,
                        pos[:e_use], nk).compile()
        ma = comp.memory_analysis()
        log(f"{name}: compiled {time.time() - t0:.0f}s "
            f"temp={ma.temp_size_in_bytes >> 20}MB")
        t0 = time.time()
        _, _, loss = comp(p, opt, jax.random.PRNGKey(2), g, x, pos[:e_use],
                          nk)
        log(f"{name}: OK {time.time() - t0:.1f}s loss={float(loss):.4f}")
        return True
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED: {str(ex)[:300]}")
        return False


BL = 1 << 18
for args in (
    ("D1 30-steps", BL, 30 * BL),
    ("D2 60-steps", BL, 60 * BL),
    ("D3 full-e-11-steps", 1 << 21, E),
    ("D4 full-e-87-steps", BL, E),
):
    if not rung(*args):
        log("stopping after first failure")
        break
log("DONE")
