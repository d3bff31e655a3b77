"""coauthor-physics-standin pipeline on TPU: exercises the sage_updated
(linear-then-aggregate) conv with D=8415 >> H and the hoist gate."""

import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/physics_check.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing...")
import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.train.loop import run_teacher  # noqa: E402
from llp_tpu.utils.config import TeacherConfig  # noqa: E402

tmp = "/tmp/llp-physics"
t0 = time.time()
t = TeacherConfig(
    datasets="coauthor-physics", dataset_dir=tmp, runs=1, epochs=8,
    eval_steps=4, epochs_per_jit=4, patience=100, hidden_channels=256,
    batch_size=64 * 1024, save_dir=tmp + "/saved",
    results_dir=tmp + "/results", log_steps=1,
)
st, _ = run_teacher(t, verbose=False)
log(f"physics teacher ({time.time() - t0:.0f}s): Hits@20 {st['Hits@20']} "
    f"AUC {st['AUC']}")
log("DONE")
