"""Round-3: drive a real (bounded) sweep on TPU (VERDICT r2 item 5).

The sweep subsystem ingests the reference's W&B YAMLs and resumes, but no
sweep had ever been driven to completion.  This runs the reference's cora
search space (configs/cora_transductive.yaml — same values as reference
configurations/cora_transductive.yaml) for 16 random trials on the cora
stand-in with early-stopped budgets (runs=1, epochs<=200, patience 8 evals),
after training the teacher the students distill from.  Best-config table
lands in docs/sample-results/sweep_cora_r3.json (+ .md summary).

One long-lived process (axon relay protocol).  The mid-sweep kill/resume
exercise runs separately on CPU (scripts/sweep_resume_exercise.sh) — the
RNG-stream contract is backend-independent and test-gated (test_sweep.py).
"""

import json
import sys
import time

import yaml

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_r3.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
log(f"devices: {jax.devices()}")

from llp_tpu.cli.sweep import run_sweep  # noqa: E402
from llp_tpu.train.loop import run_teacher  # noqa: E402
from llp_tpu.utils.config import TeacherConfig  # noqa: E402

tmp = "/tmp/llp-sweep-r3"
t0 = time.time()
tcfg = TeacherConfig(
    datasets="cora", dataset_dir=tmp, runs=1, epochs=300, eval_steps=5,
    patience=50, hidden_channels=256, batch_size=64 * 1024,
    save_dir=tmp + "/saved", results_dir=tmp + "/results",
)
tstats = run_teacher(tcfg, verbose=False)[0]  # stats DICT
log(f"teacher done in {time.time() - t0:.0f}s: "
    f"Hits@20 {tstats['Hits@20']}, AUC {tstats['AUC']}")

with open("/root/repo/configs/cora_transductive.yaml") as f:
    spec = yaml.safe_load(f)

# Early-stopped trial budget (the reference's W&B agent would run full
# 10-run protocols per trial; a bounded exercise keeps the SEARCH mechanics
# — sampling, ranking, resume stream — at ~1/50 the cost).
spec.setdefault("base", {}).update({
    "datasets": "cora", "dataset_dir": tmp, "runs": 1, "epochs": 200,
    "eval_steps": 5, "patience": 40, "hidden_channels": 256,
    "save_dir": tmp + "/saved", "results_dir": tmp + "/results",
})
spec["trials"] = 16

t0 = time.time()
out_path = "/root/repo/docs/sample-results/sweep_cora_r3.json"


class _Tee:
    def write(self, s):
        if s.strip():
            log(s.strip())

    def flush(self):
        pass


_stdout = sys.stdout
sys.stdout = _Tee()  # route the sweep's per-trial prints into the log
try:
    result = run_sweep(spec, out_path=out_path, seed=3, verbose=True)
finally:
    sys.stdout = _stdout
log(f"sweep done in {time.time() - t0:.0f}s")
log(f"best: {json.dumps(result['best'])}")
log("DONE")
