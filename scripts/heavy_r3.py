"""Round-3 heavy-configuration TPU validation (VERDICT r2 items 3, 4, 8).

One long-lived process (axon relay protocol), three phases:

A. Segment-max floor measurement — the written justification for NOT
   building a Pallas max-reduce variant of the windowed segsum kernel
   (VERDICT item 8): time the XLA sorted segment-max against its component
   floor (the sender gather) and the segsum sum kernel at the bench shape.
B. LLP_R at C≈60 (VERDICT item 3): the reference's collab sweeps reach
   rw_step·hops·(1+ns_rate) ≈ 60 contexts → C(60,2)=1770 pairs/anchor
   (/root/reference/configurations/collab_transductive.yaml:36-57, pair
   construction main.py:110-122).  Full driver pipeline on the collab
   stand-in: teacher → C-small student (quality baseline) → C=60 student
   through the chunked llp_r scan.  ms/step, device memory, quality.
C. Production setting at collab scale (VERDICT item 4): the full
   production teacher+student pipeline on the collab-shaped stand-in
   (double encode over old+new inference graph at N≈236k), 5-tuple buckets
   + wall time (reference train_teacher_gnn.py:157-268).
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/heavy_r3.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
log(f"devices: {jax.devices()}")


def mem_mb():
    try:
        from llp_tpu.utils.memory import get_device_memory_map

        m = get_device_memory_map()
        d = next(iter(m.values()))
        return {k: v >> 20 for k, v in d.items()}
    except Exception as ex:  # noqa: BLE001
        return {"err": str(ex)[:80]}


# ---- A. segment-max floor -------------------------------------------------
log("--- A: segment-max floor (413k x 256, bench shape) ---")
try:
    from llp_tpu.core import build_graph
    from llp_tpu.data.synthetic import community_features, sbm_graph
    from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum
    from llp_tpu.ops.spmm import spmm

    ei, comm = sbm_graph(20_000, 16, 16.0, seed=7)
    x = jnp.asarray(community_features(comm, 256, kind="gauss", seed=7))
    g = build_graph(ei, 20_000)
    prepare_segsum(g)
    K = 20

    def chain(name, fn):
        # thread a scalar through so XLA can't hoist the body
        @jax.jit
        def run2(xv):
            def step(c, _):
                out = fn(xv + c * 1e-30)
                return c * 0.999 + jnp.sum(out[0]) * 1e-12, ()

            c, _ = lax.scan(step, jnp.float32(0.0), None, length=K)
            return c

        c = run2(x)
        _ = float(c)
        t0 = time.perf_counter()
        c = run2(x)
        _ = float(c)
        log(f"  {name}: {(time.perf_counter() - t0) / K * 1e3:.2f} ms")

    chain("gather only (senders)", lambda xv: jnp.take(xv, g.senders, axis=0))
    chain("segsum kernel mean", lambda xv: spmm(g, xv, "mean", impl="segsum"))
    chain("XLA sorted sum", lambda xv: spmm(g, xv, "sum", impl="xla"))
    chain("XLA segment-max", lambda xv: spmm(g, xv, "max", impl="xla"))
except Exception as ex:  # noqa: BLE001
    log(f"A FAILED {type(ex).__name__}: {str(ex)[:300]}")

# ---- B. LLP_R at C=60 at collab scale ------------------------------------
log("--- B: collab-scale student, LLP_R C=60 (chunked) ---")
try:
    from llp_tpu.train.loop import run_student, run_teacher
    from llp_tpu.utils.config import StudentConfig, TeacherConfig

    tmp = "/tmp/llp-heavy-r3"
    t0 = time.time()
    tcfg = TeacherConfig(
        datasets="collab", dataset_dir=tmp, runs=1, epochs=12, eval_steps=4,
        patience=100, num_layers=3, hidden_channels=256,
        batch_size=64 * 1024,
        save_dir=tmp + "/saved", results_dir=tmp + "/results",
    )
    tstats = run_teacher(tcfg, verbose=False)[0]  # stats DICT
    log(f"teacher done in {time.time() - t0:.0f}s: "
        f"AUC {tstats['AUC']}, Hits@50 {tstats['Hits@50']}")
    log(f"  mem after teacher: {mem_mb()}")

    common = dict(
        datasets="collab", dataset_dir=tmp, minibatch=True, runs=1,
        epochs=8, eval_steps=4, patience=100, hidden_channels=256,
        link_batch_size=64 * 1024, compute_dtype="bfloat16",
        save_dir=tmp + "/saved", results_dir=tmp + "/results",
    )
    t0 = time.time()
    scfg = StudentConfig(**common)  # C = 3*2*2 = 12 (defaults)
    s_small = run_student(scfg, verbose=False)[0]
    log(f"student C=12 done in {time.time() - t0:.0f}s: "
        f"AUC {s_small['AUC']}, Hits@50 {s_small['Hits@50']}")

    # C = rw_step * hops * (1 + ns_rate) = 5*3*4 = 60 -> 1770 pairs/anchor.
    t0 = time.time()
    scfg60 = StudentConfig(**common, rw_step=5, hops=3, ns_rate=3,
                           llp_r_chunk=354)  # 1770 = 5*354: exact chunking
    s60 = run_student(scfg60, verbose=False)[0]
    dt60 = time.time() - t0
    log(f"student C=60 llp_r_chunk=354 done in {dt60:.0f}s: "
        f"AUC {s60['AUC']}, Hits@50 {s60['Hits@50']}")
    log(f"  mem after C=60 student: {mem_mb()}")
    for k in ("epoch_s", "edges_per_s", "steps_per_s"):
        if k in s60:
            log(f"  {k}: {s60[k]}")
except Exception as ex:  # noqa: BLE001
    import traceback

    log(f"B FAILED {type(ex).__name__}: {str(ex)[:400]}")
    log(traceback.format_exc()[-600:])

# ---- C. production at collab scale ---------------------------------------
log("--- C: production setting at collab scale ---")
try:
    t0 = time.time()
    tcfg_p = TeacherConfig(
        datasets="collab", dataset_dir=tmp, runs=1, epochs=12, eval_steps=4,
        patience=100, num_layers=3, hidden_channels=256,
        batch_size=64 * 1024, transductive="production",
        save_dir=tmp + "/saved", results_dir=tmp + "/results",
    )
    tp = run_teacher(tcfg_p, verbose=False)[0]
    dt_t = time.time() - t0
    log(f"production teacher done in {dt_t:.0f}s")
    for k in ("AUC", "Hits@50"):
        log(f"  teacher {k}: {tp.get(k)}")
    log(f"  mem: {mem_mb()}")

    t0 = time.time()
    scfg_p = StudentConfig(**{**common, "transductive": "production"})
    sp = run_student(scfg_p, verbose=False)[0]
    dt_s = time.time() - t0
    log(f"production student done in {dt_s:.0f}s")
    for k in ("AUC", "Hits@50"):
        log(f"  student {k}: {sp.get(k)}")
except Exception as ex:  # noqa: BLE001
    import traceback

    log(f"C FAILED {type(ex).__name__}: {str(ex)[:400]}")
    log(traceback.format_exc()[-600:])

log("DONE")
