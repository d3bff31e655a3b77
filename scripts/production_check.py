"""Production (unseen-node) protocol on TPU with all session-2 code:
teacher + LLP student, cora stand-in, 3 runs. Writes to argv[1]."""

import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/production_check.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing...")
import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.train.loop import run_student, run_teacher  # noqa: E402
from llp_tpu.utils.config import StudentConfig, TeacherConfig  # noqa: E402

tmp = "/tmp/llp-prod-check"
t0 = time.time()
t = TeacherConfig(
    datasets="cora", dataset_dir=tmp, transductive="production", runs=3,
    epochs=150, eval_steps=1, patience=100, hidden_channels=256,
    batch_size=64 * 1024, save_dir=tmp + "/saved",
    results_dir=tmp + "/results", log_steps=1000,
)
st, _ = run_teacher(t, verbose=False)
log(f"prod teacher ({time.time() - t0:.0f}s): Hits@20 {st['Hits@20']}")
log(f"  AUC {st['AUC']}")

t0 = time.time()
s = StudentConfig(
    datasets="cora", dataset_dir=tmp, transductive="production", runs=3,
    epochs=150, eval_steps=1, patience=100, hidden_channels=256,
    link_batch_size=64 * 1024, save_dir=tmp + "/saved",
    results_dir=tmp + "/results", log_steps=1000,
)
ss, _ = run_student(s, verbose=False)
log(f"prod student ({time.time() - t0:.0f}s): Hits@20 {ss['Hits@20']}")
log(f"  AUC {ss['AUC']}")
log("DONE")
