"""Round-4 TPU batch 3: bounded PRODUCTION-setting sweep on the cora
stand-in (VERDICT r3 item 7) with an in-process interrupt+resume.

The round-3 sweep exercised transductive cora only; the reference also
ships production search spaces (configurations/*_production.yaml —
ingested verbatim as configs/cora_production.yaml).  This trains the
production teacher, then runs the reference search space for 12 trials —
deliberately in TWO run_sweep calls (6 trials, then resume=True to 12):
the resume path replays the completed trials' RNG draws, so the second
call must continue the exact uninterrupted stream (the SIGKILL variant of
this contract is exercised at CLI level on CPU,
scripts/sweep_resume_exercise.sh; killing a live TPU client here would
only wedge the relay).  Results land in
docs/sample-results/sweep_cora_production_r4.json.

One long-lived process (axon relay protocol); log to argv[1].
"""

import json
import sys
import time

import yaml

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4_sweep_prod.log"
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

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
tmp = "/tmp/llp-sweep-prod-r4"
t0 = time.time()
tcfg = TeacherConfig(
    datasets="cora", dataset_dir=tmp, transductive="production", runs=1,
    epochs=300, eval_steps=5, patience=50, hidden_channels=256,
    batch_size=64 * 1024, save_dir=tmp + "/saved",
    results_dir=tmp + "/results",
)
tstats = run_teacher(tcfg, verbose=False)[0]
log(f"production teacher done in {time.time() - t0:.0f}s: "
    f"Hits@20 {tstats['Hits@20']}, AUC {tstats['AUC']}")

with open(_os.path.join(REPO, "configs", "cora_production.yaml")) as f:
    spec = yaml.safe_load(f)

spec.setdefault("base", {}).update({
    "datasets": "cora", "dataset_dir": tmp, "transductive": "production",
    "runs": 1, "epochs": 200, "eval_steps": 5, "patience": 40,
    "hidden_channels": 256, "save_dir": tmp + "/saved",
    "results_dir": tmp + "/results",
})
spec["trials"] = 12

out_path = _os.path.join(
    REPO, "docs", "sample-results", "sweep_cora_production_r4.json"
)


class _Tee:
    def write(self, s):
        if s.strip():
            log(s.strip())

    def flush(self):
        pass


_stdout = sys.stdout
sys.stdout = _Tee()
try:
    t0 = time.time()
    run_sweep(spec, out_path=out_path, seed=4, max_trials=6, verbose=True)
    log_f.write(f"--- first 6 trials done in {time.time() - t0:.0f}s; "
                f"resuming to 12 ---\n")
    t0 = time.time()
    result = run_sweep(spec, out_path=out_path, seed=4, verbose=True,
                       resume=True)
finally:
    sys.stdout = _stdout
log(f"resumed trials done in {time.time() - t0:.0f}s")
log(f"best: {json.dumps(result['best'])}")
log(f"history length: {len(result['history'])}")
log("DONE")
