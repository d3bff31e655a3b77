#!/bin/bash
# Round-3 (VERDICT r2 item 5): a REAL mid-sweep kill + --resume at the CLI
# level, verifying the resumed sweep reproduces the uninterrupted RNG
# stream trial-for-trial.  CPU (the stream contract is backend-independent;
# test_sweep.py gates it in-process — this exercises the actual
# kill/restart workflow).  Usage: bash scripts/sweep_resume_exercise.sh
set -u
TMP=/tmp/llp-sweep-resume
rm -rf "$TMP" && mkdir -p "$TMP"
cd /root/repo

# Bounded spec on the cora stand-in (teacher first: students distill).
python - <<'EOF'
import jax; jax.config.update("jax_platforms", "cpu")
import yaml
from llp_tpu.train.loop import run_teacher
from llp_tpu.utils.config import TeacherConfig

tmp = "/tmp/llp-sweep-resume"
run_teacher(TeacherConfig(
    datasets="cora", dataset_dir=tmp, runs=1, epochs=30, eval_steps=5,
    patience=20, hidden_channels=64, batch_size=8192,
    save_dir=tmp + "/saved", results_dir=tmp + "/results"), verbose=False)
spec = yaml.safe_load(open("configs/cora_transductive.yaml"))
spec.setdefault("base", {}).update({
    "datasets": "cora", "dataset_dir": tmp, "runs": 1, "epochs": 20,
    "eval_steps": 5, "patience": 10, "hidden_channels": 64,
    "save_dir": tmp + "/saved", "results_dir": tmp + "/results"})
spec["trials"] = 6
yaml.safe_dump(spec, open(tmp + "/spec.yaml", "w"))
print("teacher + spec ready")
EOF

# Uninterrupted 6-trial reference stream.
python -m llp_tpu.cli.sweep --config "$TMP/spec.yaml" --seed 11 \
    --out "$TMP/ref.json" --device cpu > "$TMP/ref.log" 2>&1
echo "reference sweep done"

# Interrupted sweep: SIGKILL the driver mid-trial (~trial 3), then resume.
python -m llp_tpu.cli.sweep --config "$TMP/spec.yaml" --seed 11 \
    --out "$TMP/killed.json" --device cpu > "$TMP/killed.log" 2>&1 &
PID=$!
while [ ! -f "$TMP/killed.json" ] || \
      [ "$(python -c "import json;print(len(json.load(open('$TMP/killed.json'))['history']))" 2>/dev/null || echo 0)" -lt 3 ]; do
  sleep 1
  kill -0 $PID 2>/dev/null || break
done
kill -9 $PID 2>/dev/null
wait $PID 2>/dev/null
echo "killed mid-sweep after $(python -c "import json;print(len(json.load(open('$TMP/killed.json'))['history']))") completed trials"

python -m llp_tpu.cli.sweep --config "$TMP/spec.yaml" --seed 11 \
    --out "$TMP/killed.json" --resume --device cpu >> "$TMP/killed.log" 2>&1
echo "resumed to completion"

# The resumed stream must equal the uninterrupted one trial-for-trial.
python - <<'EOF'
import json
ref = json.load(open("/tmp/llp-sweep-resume/ref.json"))
res = json.load(open("/tmp/llp-sweep-resume/killed.json"))
assert len(ref["history"]) == len(res["history"]) == 6
for a, b in zip(ref["history"], res["history"]):
    assert a["params"] == b["params"], (a, b)
print("PASS: resumed sweep reproduces the uninterrupted RNG stream"
      " (6/6 trials, params identical)")
EOF
