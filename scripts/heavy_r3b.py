"""Round-3 heavy-config continuation (fixes heavy_r3.py's stats access —
run_teacher/run_student return the stats DICT, not a list).

Reuses the teacher artifacts heavy_r3.py already trained and saved
(/tmp/llp-heavy-r3/saved): runs the C=12 baseline student, the LLP_R C=60
chunked student (VERDICT item 3), and the production student against the
production teacher (VERDICT item 4 — the production teacher itself was
trained by heavy_r3.py phase C before its logging crash).
"""

import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/heavy_r3b.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
log(f"devices: {jax.devices()}")

from llp_tpu.train.loop import run_student, run_teacher  # noqa: E402
from llp_tpu.utils.config import StudentConfig, TeacherConfig  # noqa: E402


def mem_mb():
    try:
        from llp_tpu.utils.memory import get_device_memory_map

        d = next(iter(get_device_memory_map().values()))
        return {k: v >> 20 for k, v in d.items()}
    except Exception as ex:  # noqa: BLE001
        return {"err": str(ex)[:80]}


def fmt(stats, *keys):
    return "  ".join(f"{k}={stats.get(k)}" for k in keys)


tmp = "/tmp/llp-heavy-r3"
common = dict(
    datasets="collab", dataset_dir=tmp, minibatch=True, runs=1,
    epochs=8, eval_steps=4, patience=100, hidden_channels=256,
    link_batch_size=64 * 1024, compute_dtype="bfloat16",
    save_dir=tmp + "/saved", results_dir=tmp + "/results",
)

log("--- B (cont.): collab-scale students ---")
try:
    t0 = time.time()
    s_small = run_student(StudentConfig(**common), verbose=False)[0]
    log(f"student C=12 in {time.time() - t0:.0f}s: "
        f"{fmt(s_small, 'AUC', 'Hits@50')}")

    t0 = time.time()
    s60 = run_student(
        StudentConfig(**common, rw_step=5, hops=3, ns_rate=3,
                      llp_r_chunk=354),
        verbose=False,
    )[0]
    dt = time.time() - t0
    log(f"student C=60 llp_r_chunk=354 in {dt:.0f}s: "
        f"{fmt(s60, 'AUC', 'Hits@50')}")
    log(f"  mem after C=60: {mem_mb()}")
except Exception as ex:  # noqa: BLE001
    import traceback

    log(f"B FAILED {type(ex).__name__}: {str(ex)[:300]}")
    log(traceback.format_exc()[-500:])

log("--- C (cont.): production students at collab scale ---")
try:
    import os

    if not os.path.exists(tmp + "/saved/collab-sage_production.npz"):
        t0 = time.time()
        tp = run_teacher(
            TeacherConfig(
                datasets="collab", dataset_dir=tmp, runs=1, epochs=12,
                eval_steps=4, patience=100, num_layers=3,
                hidden_channels=256, batch_size=64 * 1024,
                transductive="production",
                save_dir=tmp + "/saved", results_dir=tmp + "/results",
            ),
            verbose=False,
        )[0]
        log(f"production teacher in {time.time() - t0:.0f}s: "
            f"{fmt(tp, 'AUC', 'Hits@50')}")
    t0 = time.time()
    sp = run_student(
        StudentConfig(**{**common, "transductive": "production"}),
        verbose=False,
    )[0]
    log(f"production student in {time.time() - t0:.0f}s: "
        f"{fmt(sp, 'AUC', 'Hits@50')}")
    log(f"  mem: {mem_mb()}")
except Exception as ex:  # noqa: BLE001
    import traceback

    log(f"C FAILED {type(ex).__name__}: {str(ex)[:300]}")
    log(traceback.format_exc()[-500:])

log("DONE")
