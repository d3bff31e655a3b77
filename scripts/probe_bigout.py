"""Round-5 diagnostic: does the segsum kernel fault when its OUTPUT buffer
exceeds 2 GiB (int32 byte-offset territory for the window DMAs)?

The 10M-node packed teacher epoch COMPILED at 15.35 GiB but EXECUTION
crashed the TPU worker ("kernel fault").  Every prior hardware execution of
the kernel had out <= 512 MB (N=1M fp32); 10M rows x 128 lanes bf16 =
2.56 GB > 2^31.  Ladder (one process, expected-OK rungs first — a worker
crash kills the client connection):

  A. N=10M, edges confined to the first 4M rows  -> max window byte offset
     ~1.07 GB, ALLOCATION 2.56 GB.  OK here = big allocation itself is fine.
  B. N=7.5M, edges spanning all rows -> max offset ~1.92 GB (< 2^31). OK
     here = offsets under 2^31 are fine at any row count.
  C. N=9M, edges spanning all rows -> max offset ~2.30 GB (> 2^31).  A
     crash here (after A+B passed) pins int32 byte-offset overflow.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_bigout.py <log>
"""

import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_bigout.log"
LOG = open(OUT, "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import ml_dtypes  # noqa: E402
import numpy as np  # noqa: E402

log(f"=== probe_bigout start; devices: {jax.devices()}")

from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import attach_segsum  # noqa: E402
from llp_tpu.ops.spmm import spmm  # noqa: E402

E = 2_000_000
D = 64


def rung(name, n_nodes, row_span):
    rng = np.random.default_rng(7)
    ei = rng.integers(0, row_span, size=(2, E), dtype=np.int64)
    t0 = time.time()
    g = attach_segsum(build_graph(ei, n_nodes))
    z1 = jnp.zeros((1,), jnp.int32)
    g = g.replace(senders=z1, receivers=z1, csr_row=z1,
                  edge_mask=jnp.zeros((1,), bool))
    x = jnp.asarray(
        rng.normal(size=(n_nodes, D)).astype(ml_dtypes.bfloat16))
    out_gb = g.seg_meta[0][1] * 128 * 2 / 2**30
    log(f"{name}: N={n_nodes} span={row_span} out_buffer={out_gb:.2f}GiB "
        f"max_offset~{row_span * 128 * 2 / 2**30:.2f}GiB "
        f"(setup {time.time() - t0:.0f}s)")
    try:
        t0 = time.time()
        y = jax.jit(lambda g, x: spmm(g, x, "mean", impl="segsum"))(g, x)
        hi = float(y[row_span - 1, 0].astype(jnp.float32))
        lo = float(y[0, 0].astype(jnp.float32))
        log(f"{name}: OK in {time.time() - t0:.1f}s  y[0,0]={lo:.4f} "
            f"y[span-1,0]={hi:.4f}")
        return True
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED: {str(ex)[:400]}")
        return False


for name, n, span in (
    ("A low-rows@10M", 10_000_000, 4_000_000),
    ("B full-span@7.5M", 7_500_000, 7_500_000),
    ("C full-span@9M", 9_000_000, 9_000_000),
):
    if not rung(name, n, span):
        log("stopping after first failure (worker connection is gone)")
        break
log("DONE")
