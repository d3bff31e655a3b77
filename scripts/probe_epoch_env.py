"""Round-5 diagnostic 5: environment vs dtype vs scale for the epoch crash.

The plain chunked epoch (round-3 structure, no round-5 features) crashes at
N=5M on this VM.  The round-3-validated 1M teacher ran fp32 unchunked on an
OLDER VM.  Ladder (one process, stop at crash):

  P1: N=1M sbm (deg 6) epoch, fp32, default chunk (unchunked here)
      == the round-3-validated configuration.  Crash => environment
      regression on this VM (bench itself would be at risk).
  P2: same graph, compute_dtype=bfloat16 (unchunked).
  P3: N=5M cache-slice, fp32 (chunked at 512MB).
  P4: N=5M cache-slice, bf16 (the known-crash config).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_epoch_env.py <log>
"""

import os
import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_epoch_env.log"
LOG = open(OUT, "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


os.environ.setdefault("LLP_SEGSUM_CHUNK_BYTES", str(1 << 29))
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import ml_dtypes  # noqa: E402
import numpy as np  # noqa: E402

log(f"=== probe_epoch_env start; devices: {jax.devices()}")

from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.data.synthetic import sbm_graph  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import attach_segsum  # noqa: E402
from llp_tpu.train.teacher import (  # noqa: E402
    init_teacher_params,
    make_teacher_epoch_fn,
)

rng = np.random.default_rng(0)


def make(n, ei):
    g = attach_segsum(build_graph(ei.astype(np.int64), n))
    z1 = jnp.zeros((1,), jnp.int32)
    g = g.replace(senders=z1, receivers=z1, csr_row=z1,
                  edge_mask=jnp.zeros((1,), bool))
    pos = jnp.asarray(ei.T.astype(np.int32))
    return g, pos, ei.shape[1]


t0 = time.time()
ei1, _ = sbm_graph(1_000_000, 64, 6.0, seed=5)
g1, pos1, e1 = make(1_000_000, ei1)
x1_32 = jnp.asarray(rng.normal(size=(1_000_000, 64)).astype(np.float32))
x1_16 = x1_32.astype(jnp.bfloat16)
del ei1

with np.load("/tmp/scale10m_cache_10000000.npz") as z:
    EI = z["ei"]
keep = (EI[0] < 5_000_000) & (EI[1] < 5_000_000)
ei5 = EI[:, keep]
del EI
g5, pos5, e5 = make(5_000_000, ei5)
x5_32 = jnp.asarray(rng.normal(size=(5_000_000, 64)).astype(np.float32))
x5_16 = x5_32.astype(jnp.bfloat16)
del ei5
log(f"setup {time.time() - t0:.0f}s (E1={e1} E5={e5})")

params = init_teacher_params(
    jax.random.PRNGKey(0), encoder="sage", in_channels=64,
    hidden_channels=128, num_layers=2, predictor_mode="mlp",
)
nk = jnp.zeros((1,), jnp.int32)


def rung(name, g, pos, e, n, x, cdtype):
    fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=0.0, num_nodes=n,
        num_pos_edges=e, link_batch_size=1 << 18, neg_mode="uniform",
        lr=0.005, spmm_impl="segsum", compute_dtype=cdtype,
    )
    # epoch_fn DONATES params/opt — fresh copies per rung
    p = jax.tree_util.tree_map(jnp.copy, params)
    opt = tx.init(p)
    try:
        t0 = time.time()
        comp = fn.lower(p, opt, jax.random.PRNGKey(1), g, x, pos,
                        nk).compile()
        ma = comp.memory_analysis()
        log(f"{name}: compiled {time.time() - t0:.0f}s "
            f"temp={ma.temp_size_in_bytes >> 20}MB "
            f"args={ma.argument_size_in_bytes >> 20}MB")
        t0 = time.time()
        _, _, loss = comp(p, opt, jax.random.PRNGKey(2), g, x, pos, nk)
        lv = float(loss)
        log(f"{name}: EPOCH OK {time.time() - t0:.1f}s loss={lv:.4f}")
        return True
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED: {str(ex)[:300]}")
        return False


for args in (
    # P1 1M-fp32 PASSED (23:13, EPOCH OK 97s) — environment is fine
    ("P2 1M-bf16", g1, pos1, e1, 1_000_000, x1_16, "bfloat16"),
    ("P3 5M-fp32", g5, pos5, e5, 5_000_000, x5_32, "float32"),
    ("P4 5M-bf16", g5, pos5, e5, 5_000_000, x5_16, "bfloat16"),
):
    if not rung(*args):
        log("stopping after first failure")
        break
log("DONE")
