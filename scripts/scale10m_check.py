"""Single-chip scale validation: teacher training on a 10M-edge graph.

N=1,000,000 nodes / ~10M directed edges / D=128 gauss features — ~5x the
collab stand-in, the largest single-chip run so far. Exercises the full
driver (split -> segsum layouts -> hoisted whole-epoch programs -> eval)
at a scale where the (E_pad, H) message tensor is ~4.4 GB.

Writes progress to argv[1]; run in background and poll.
"""

import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10m.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing...")
import jax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.train.loop import run_teacher  # noqa: E402
from llp_tpu.utils.config import TeacherConfig  # noqa: E402

log(f"backend={jax.default_backend()}")

tmp = "/tmp/llp-scale10m"
cfg = TeacherConfig(
    datasets="synthetic:sbm:1000000:64:10.0:1:128:gauss",
    dataset_dir=tmp, encoder="sage", num_layers=2, hidden_channels=128,
    runs=1, epochs=4, eval_steps=4, epochs_per_jit=2, patience=100,
    batch_size=64 * 1024, save_dir=tmp + "/saved",
    results_dir=tmp + "/results", log_steps=1,
)
t0 = time.time()
stats, loggers = run_teacher(cfg, verbose=False)
log(f"teacher done in {time.time() - t0:.1f}s")
log(f"stats: { {k: v for k, v in stats.items()} }")
log("DONE")
