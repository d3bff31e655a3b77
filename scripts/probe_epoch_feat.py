"""Round-5 diagnostic 4: which EPOCH FEATURE crashes the worker?

probe_epoch_n showed the crash is structural (N=5M, 7 GiB plan, still
crashes).  All round-5 epoch features are hardware-virgin: gather_last,
remat, packed_x, and the chunked segsum running INSIDE the step scan.
One process, one graph build (N=5M slice of the cache), rungs stop at the
first crash:

  R0: full features, chunking DISABLED (huge chunk budget)
  R1: chunked, no gather_last / remat / packed (hoisted x_agg in-program)
  R2: chunked + packed
  R3: chunked + packed + gather_last
  R4: chunked + packed + gather_last + remat  (the crashing config)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_epoch_feat.py <log>
"""

import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_epoch_feat.log"
LOG = open(OUT, "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import ml_dtypes  # noqa: E402
import numpy as np  # noqa: E402

log(f"=== probe_epoch_feat start; devices: {jax.devices()}")

from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.models.encoder import (  # noqa: E402
    pack_first_layer_input,
    precompute_first_aggregation,
)
from llp_tpu.ops.pallas import segsum_kernel as sk  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import attach_segsum  # noqa: E402
from llp_tpu.train.teacher import (  # noqa: E402
    init_teacher_params,
    make_teacher_epoch_fn,
)

N, BL = 5_000_000, 1 << 18
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
xp = jax.jit(pack_first_layer_input, static_argnames=("impl",))(
    g, x, impl="segsum")
float(xp[0, 0].astype(jnp.float32))
pos = jnp.asarray(ei.T.astype(np.int32))
del ei
params = init_teacher_params(
    jax.random.PRNGKey(0), encoder="sage", in_channels=64,
    hidden_channels=128, num_layers=2, predictor_mode="mlp",
)
nk = jnp.zeros((1,), jnp.int32)
log(f"setup {time.time() - t0:.0f}s (N={N} E={E})")


def rung(name, chunk_bytes, packed, gather_last, remat):
    sk._CHUNK_MSG_BYTES = chunk_bytes
    fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=0.0, num_nodes=N,
        num_pos_edges=E, link_batch_size=BL, neg_mode="uniform", lr=0.005,
        spmm_impl="segsum", compute_dtype="bfloat16",
        gather_last=gather_last, remat=remat, packed_x=packed,
    )
    opt = tx.init(params)
    xin = xp if packed else x
    try:
        t0 = time.time()
        comp = fn.lower(params, opt, jax.random.PRNGKey(1), g, xin, pos,
                        nk).compile()
        ma = comp.memory_analysis()
        log(f"{name}: compiled {time.time() - t0:.0f}s "
            f"temp={ma.temp_size_in_bytes >> 20}MB "
            f"args={ma.argument_size_in_bytes >> 20}MB")
        t0 = time.time()
        _, _, loss = comp(params, opt, jax.random.PRNGKey(2), g, xin, pos, nk)
        lv = float(loss)
        log(f"{name}: EPOCH OK {time.time() - t0:.1f}s loss={lv:.4f}")
        return True
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED: {str(ex)[:300]}")
        return False


HUGE = 1 << 40
for args in (
    # R0 full-unchunked CRASHED (22:57) -> chunking exonerated; walk up the
    # feature ladder instead (one process per crash).
    ("R1 chunked-plain", 1 << 29, False, False, False),
    ("R2 chunked+packed", 1 << 29, True, False, False),
    ("R3 +gather_last", 1 << 29, True, True, False),
    ("R4 +remat(full)", 1 << 29, True, True, True),
):
    if not rung(*args):
        log("stopping after first failure")
        break
log("DONE")
