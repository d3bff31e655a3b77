"""Round-5 diagnostic 2: does the CHUNKED (lax.scan) segsum path fault on
real hardware?

probe_bigout cleared big out buffers (2.15-2.38 GiB, offsets past 2^31) on
the SINGLE-dispatch path; the 10M epoch that crashed the worker runs the
scan-chunked path (aliased carry + has_side_effects kernel inside lax.scan),
which has only ever executed under CPU interpret.  Ladder:

  A. small graph, LLP_SEGSUM_CHUNK_BYTES=64MB -> ~8-chunk scan, fast.
     Value-checked against the single-dispatch result.
  B. the cached 10M/91M graph, 1GB chunks -> the exact fwd stream the
     epoch runs.
  C. same, fwd+bwd grad.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_chunkexec.py <log>
"""

import os
import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_chunkexec.log"
LOG = open(OUT, "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import ml_dtypes  # noqa: E402
import numpy as np  # noqa: E402

log(f"=== probe_chunkexec start; devices: {jax.devices()}")

from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.ops.pallas import segsum_kernel as sk  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import attach_segsum  # noqa: E402
from llp_tpu.ops.spmm import spmm  # noqa: E402


def slim(g):
    z1 = jnp.zeros((1,), jnp.int32)
    return g.replace(senders=z1, receivers=z1, csr_row=z1,
                     edge_mask=jnp.zeros((1,), bool))


fwd = jax.jit(lambda g, x: spmm(g, x, "mean", impl="segsum"))
gr = jax.jit(lambda g, x: jax.grad(
    lambda xx: jnp.sum(spmm(g, xx, "mean", impl="segsum")
                       .astype(jnp.float32) ** 2))(x))

# ---- A: small graph, tiny chunks (scan path), value-check vs one dispatch
rng = np.random.default_rng(7)
ei = rng.integers(0, 1_000_000, size=(2, 2_000_000), dtype=np.int64)
g = slim(attach_segsum(build_graph(ei, 1_000_000)))
x = jnp.asarray(rng.normal(size=(1_000_000, 64)).astype(ml_dtypes.bfloat16))
try:
    y_single = fwd(g, x)
    v0 = float(y_single[999_000, 0].astype(jnp.float32))
    sk._CHUNK_MSG_BYTES = 64 << 20
    y_chunk = fwd(g, x)  # retraces: _CHUNK_MSG_BYTES read at trace time? it
    # is read inside _segment_sum_arrays at trace time, but fwd is already
    # compiled for these shapes — force a fresh jit:
    fwd2 = jax.jit(lambda g, x: spmm(g, x, "mean", impl="segsum"))
    y_chunk = fwd2(g, x)
    v1 = float(y_chunk[999_000, 0].astype(jnp.float32))
    diff = float(jnp.max(jnp.abs(
        y_chunk.astype(jnp.float32) - y_single.astype(jnp.float32))))
    log(f"A small-chunked: OK  v_single={v0:.4f} v_chunk={v1:.4f} "
        f"maxdiff={diff:.6f}")
    del y_single, y_chunk
except Exception as ex:  # noqa: BLE001
    log(f"A small-chunked FAILED: {str(ex)[:300]}")
    log("DONE")
    sys.exit(0)

# ---- B/C: the real 10M/91M stream, 1GB chunks
sk._CHUNK_MSG_BYTES = 1 << 30
del g, x
N = 10_000_000
with np.load(f"/tmp/scale10m_cache_{N}.npz") as z:
    ei = z["ei"]
t0 = time.time()
g = slim(attach_segsum(build_graph(ei.astype(np.int64), N)))
x = jnp.asarray(
    rng.normal(size=(N, 64)).astype(ml_dtypes.bfloat16))
del ei
log(f"B setup in {time.time() - t0:.0f}s")
try:
    t0 = time.time()
    fwd3 = jax.jit(lambda g, x: spmm(g, x, "mean", impl="segsum"))
    y = fwd3(g, x)
    v = float(y[N - 5, 0].astype(jnp.float32))
    log(f"B 10M-chunked fwd: OK in {time.time() - t0:.1f}s  y[N-5,0]={v:.4f}")
    del y
except Exception as ex:  # noqa: BLE001
    log(f"B 10M-chunked fwd FAILED: {str(ex)[:300]}")
    log("DONE")
    sys.exit(0)
try:
    t0 = time.time()
    d = gr(g, x)
    v = float(d[N - 5, 0].astype(jnp.float32))
    log(f"C 10M-chunked grad: OK in {time.time() - t0:.1f}s d[N-5,0]={v:.4f}")
except Exception as ex:  # noqa: BLE001
    log(f"C 10M-chunked grad FAILED: {str(ex)[:300]}")
log("DONE")
