"""One TPU session: bench confirmation + cora-standin full-protocol quality
refresh (3 runs, transductive) with all session-2 code. Writes to argv[1]."""

import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/final_check.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing...")
import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import bench  # noqa: E402

ei, x = bench.build_problem()
eps = bench.bench_tpu(ei, x)
log(f"bench_tpu: {eps / 1e6:.2f}M edges/s")

from llp_tpu.train.loop import run_student, run_teacher  # noqa: E402
from llp_tpu.utils.config import StudentConfig, TeacherConfig  # noqa: E402

tmp = "/tmp/llp-final-cora"
t0 = time.time()
t = TeacherConfig(
    datasets="cora", dataset_dir=tmp, runs=3, epochs=200, eval_steps=1,
    patience=100, hidden_channels=256, batch_size=64 * 1024,
    save_dir=tmp + "/saved", results_dir=tmp + "/results", log_steps=1000,
)
st, _ = run_teacher(t, verbose=False)
log(f"teacher cora-standin ({time.time() - t0:.0f}s): "
    f"Hits@20 {st['Hits@20']} AUC {st['AUC']}")

t0 = time.time()
s = StudentConfig(
    datasets="cora", dataset_dir=tmp, runs=3, epochs=200, eval_steps=1,
    patience=100, hidden_channels=256, link_batch_size=64 * 1024,
    save_dir=tmp + "/saved", results_dir=tmp + "/results", log_steps=1000,
)
ss, _ = run_student(s, verbose=False)
log(f"student cora-standin ({time.time() - t0:.0f}s): "
    f"Hits@20 {ss['Hits@20']} AUC {ss['AUC']}")
log("DONE")
