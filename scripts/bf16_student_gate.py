"""bf16 student quality gate at collab scale (session 6).

With dropout masks off the threefry path (ops/rng.py), bf16 compute measured
1.37x on the student step (scripts/bench_student_rbg run, BASELINE.md). This
gates the quality claim: ONE fp32 teacher artifact, then the SAME student
config run at compute_dtype=float32 and =bfloat16 — compare AUC / Hits@50 and
wall time. Default dropout=0.5 stays on, so this is also the end-to-end
validation of the rbg dropout path at scale. Writes progress to argv[1].
"""

import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bf16_gate.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing...")
import jax  # noqa: E402

log(f"backend={jax.default_backend()}")
import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.train.loop import run_student, run_teacher  # noqa: E402
from llp_tpu.utils.config import StudentConfig, TeacherConfig  # noqa: E402

tmp = "/tmp/llp-bf16-gate"
t0 = time.time()
tcfg = TeacherConfig(
    datasets="collab", dataset_dir=tmp, encoder="sage", num_layers=3,
    hidden_channels=256, runs=1, epochs=12, eval_steps=4, epochs_per_jit=4,
    patience=100, batch_size=64 * 1024, save_dir=tmp + "/saved",
    results_dir=tmp + "/results", log_steps=1,
)
stats, _ = run_teacher(tcfg, verbose=False)
log(f"teacher done in {time.time() - t0:.1f}s: {dict(stats)}")

for dtype in ("float32", "bfloat16"):
    t0 = time.time()
    scfg = StudentConfig(
        datasets="collab", dataset_dir=tmp, minibatch=True, runs=1, epochs=6,
        eval_steps=2, epochs_per_jit=2, patience=100, hidden_channels=256,
        num_layers=3, link_batch_size=64 * 1024, save_dir=tmp + "/saved",
        results_dir=tmp + "/results", log_steps=1, compute_dtype=dtype,
    )
    sstats, _ = run_student(scfg, verbose=False)
    log(f"student[{dtype}] done in {time.time() - t0:.1f}s: {dict(sstats)}")
log("DONE")
