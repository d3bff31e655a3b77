"""Round-5 diagnostic 3: bisect the 10M teacher-epoch worker crash by N.

The isolated chunked/bf16/big-buffer kernel probes all pass at the full 91M
edge stream; the whole-epoch program crashes the worker at N=10M even with
~630 MiB planned headroom.  Run ONE epoch of the EXACT epoch program at
increasing sub-scales (edges of the cached 10M graph filtered to both
endpoints < N'):

  A. N'=5M   (plan ~8 GiB)   — structure check far from the memory edge
  B. N'=8M   (plan ~12 GiB)  — closer
  C. N'=10M, bl=2^16 (plan ~14.6 GiB) — smallest 10M program

A pass at B + crash at C = N=10M-specific; crash at A = program structure.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_epoch_n.py <log>
"""

import os
import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_epoch_n.log"
LOG = open(OUT, "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


os.environ.setdefault("LLP_SEGSUM_CHUNK_BYTES", str(1 << 29))
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import ml_dtypes  # noqa: E402
import numpy as np  # noqa: E402

log(f"=== probe_epoch_n start; devices: {jax.devices()}")

from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.models.encoder import pack_first_layer_input  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import attach_segsum  # noqa: E402
from llp_tpu.train.teacher import (  # noqa: E402
    init_teacher_params,
    make_teacher_epoch_fn,
)

with np.load("/tmp/scale10m_cache_10000000.npz") as z:
    EI = z["ei"]
rng = np.random.default_rng(0)


def rung(name, n, bl):
    t0 = time.time()
    keep = (EI[0] < n) & (EI[1] < n)
    ei = EI[:, keep]
    e = ei.shape[1]
    g = attach_segsum(build_graph(ei.astype(np.int64), n))
    z1 = jnp.zeros((1,), jnp.int32)
    g = g.replace(senders=z1, receivers=z1, csr_row=z1,
                  edge_mask=jnp.zeros((1,), bool))
    x = jnp.asarray(rng.normal(size=(n, 64)).astype(ml_dtypes.bfloat16))
    xp = jax.jit(pack_first_layer_input, static_argnames=("impl",))(
        g, x, impl="segsum")
    float(xp[0, 0].astype(jnp.float32))
    del x
    pos = jnp.asarray(ei.T.astype(np.int32))
    del ei
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=64,
        hidden_channels=128, num_layers=2, predictor_mode="mlp",
    )
    fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=0.0, num_nodes=n,
        num_pos_edges=e, link_batch_size=bl, neg_mode="uniform", lr=0.005,
        spmm_impl="segsum", compute_dtype="bfloat16", gather_last=True,
        remat=True, packed_x=True,
    )
    opt = tx.init(params)
    nk = jnp.zeros((1,), jnp.int32)
    log(f"{name}: N={n} E={e} bl={bl} setup {time.time() - t0:.0f}s")
    try:
        t0 = time.time()
        lowered = fn.lower(params, opt, jax.random.PRNGKey(1), g, xp, pos, nk)
        comp = lowered.compile()
        ma = comp.memory_analysis()
        log(f"{name}: compiled {time.time() - t0:.0f}s "
            f"temp={ma.temp_size_in_bytes >> 20}MB "
            f"args={ma.argument_size_in_bytes >> 20}MB")
        t0 = time.time()
        params, opt, loss = comp(params, opt, jax.random.PRNGKey(2), g, xp,
                                 pos, nk)
        lv = float(loss)
        log(f"{name}: EPOCH OK {time.time() - t0:.1f}s loss={lv:.4f}")
        return True
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED: {str(ex)[:300]}")
        return False


for name, n, bl in (
    ("A epoch@5M", 5_000_000, 1 << 18),
    ("B epoch@8M", 8_000_000, 1 << 18),
    ("C epoch@10M bl=2^16", 10_000_000, 1 << 16),
):
    if not rung(name, n, bl):
        log("stopping after first failure")
        break
log("DONE")
