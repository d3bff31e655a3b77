"""Driver-level collab-scale student at bf16 compute (session 7).

Records what a user gets from `--compute_dtype=bfloat16 --minibatch` at
N=236k: throughput through the full driver (not just the step) + quality
parity vs the fp32 run recorded in BASELINE.md. Axon protocol: one process,
line-buffered log (argv[1]).
"""

import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/collab_bf16.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing...")
import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.train.loop import run_student  # noqa: E402
from llp_tpu.utils.config import StudentConfig  # noqa: E402

# Teacher artifacts from the earlier collab_refresh run this session.
tmp = "/tmp/llp-collab-refresh"
for dtype in ("bfloat16",):
    t0 = time.time()
    scfg = StudentConfig(
        datasets="collab", dataset_dir=tmp, minibatch=True, runs=1, epochs=6,
        eval_steps=3, patience=100, hidden_channels=256,
        link_batch_size=64 * 1024, compute_dtype=dtype,
        save_dir=tmp + "/saved", results_dir=tmp + "/results", log_steps=1,
    )
    stats, _ = run_student(scfg, verbose=False)
    log(f"student[{dtype}] done in {time.time() - t0:.1f}s")
    log(f"  Hits@50 {stats['Hits@50']}")
    log(f"  AUC {stats['AUC']}")
log("DONE")
