"""Round-3 closing ritual: cora-standin full-protocol quality (3 runs,
transductive teacher + student) on TPU with the final round-3 code —
confirms the training semantics still reproduce the recorded bands
(session-7 uniform-sampler numbers: teacher Hits@20 valid 43.8±3.9 /
AUC 86.7; student 50.0±1.4 / AUC 88.8, student ≥ teacher).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/final_check_r3.py <log>
"""

import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/final_check_r3.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing...")
import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import jax  # noqa: E402

log(f"devices: {jax.devices()}")

from llp_tpu.train.loop import run_student, run_teacher  # noqa: E402
from llp_tpu.utils.config import StudentConfig, TeacherConfig  # noqa: E402

tmp = "/tmp/llp-final-r3"
t0 = time.time()
t = TeacherConfig(
    datasets="cora", dataset_dir=tmp, runs=3, epochs=200, eval_steps=1,
    patience=100, hidden_channels=256, batch_size=64 * 1024,
    save_dir=tmp + "/saved", results_dir=tmp + "/results", log_steps=1000,
)
st = run_teacher(t, verbose=False)[0]
log(f"teacher cora-standin ({time.time() - t0:.0f}s): "
    f"Hits@20 {st['Hits@20']} AUC {st['AUC']}")

t0 = time.time()
s = StudentConfig(
    datasets="cora", dataset_dir=tmp, runs=3, epochs=200, eval_steps=1,
    patience=100, hidden_channels=256, link_batch_size=64 * 1024,
    save_dir=tmp + "/saved", results_dir=tmp + "/results", log_steps=1000,
)
ss = run_student(s, verbose=False)[0]
log(f"student cora-standin ({time.time() - t0:.0f}s): "
    f"Hits@20 {ss['Hits@20']} AUC {ss['AUC']}")
log("DONE")
