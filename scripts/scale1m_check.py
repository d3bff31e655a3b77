"""Round-3: 1M-node single-chip TRAINING validation.

Scale rows so far: cora 2.7k / physics 34.5k (D=8415) / collab 236k for
training, 10M rows for serving.  This adds a 1M-node teacher + distilled
student on one chip — the memory shape that matters is the (E, H) message
buffer of the L2 SpMM (the L1 hoist removes the first-layer one): at
deg 6 / H=128 is ~3.6 GB fp32 per direction.  The FIRST attempt at this
scale OOMed at 17.4 GB and exposed a real kernel-layout bug: the segsum
local_ids array was stored (E_pad, 1), which TPU tiles to T(8,128) with
128x padding — 3.34 GB x2 of pure padding at 7M edges; fixed to (B, BE)
lane-aligned rows (segsum_kernel.py), after which H=128 fits.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/scale1m_check.py <log>
"""

import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale1m.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing...")
import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import jax  # noqa: E402

log(f"devices: {jax.devices()}")

from llp_tpu.train.loop import run_student, run_teacher  # noqa: E402
from llp_tpu.utils.config import StudentConfig, TeacherConfig  # noqa: E402

DS = "synthetic:sbm:1000000:64:6.0:5:128:gauss"  # explicit D=128: the default dim at 1M nodes is 1433, whose (E,D) eval message buffer is 43GB
tmp = "/tmp/llp-scale1m"


def mem_mb():
    try:
        from llp_tpu.utils.memory import get_device_memory_map

        d = next(iter(get_device_memory_map().values()))
        return {k: v >> 20 for k, v in d.items()}
    except Exception as ex:  # noqa: BLE001
        return {"err": str(ex)[:80]}


t0 = time.time()
t = TeacherConfig(
    datasets=DS, dataset_dir=tmp, runs=1, epochs=4, eval_steps=4,
    patience=100, num_layers=2, hidden_channels=128,
    batch_size=64 * 1024, save_dir=tmp + "/saved",
    results_dir=tmp + "/results", log_steps=1000,
)
st = run_teacher(t, verbose=False)[0]
log(f"teacher N=1M done in {time.time() - t0:.0f}s (incl. stand-in gen + "
    f"split + compiles)")
log(f"  AUC {st['AUC']}  Hits@20 {st['Hits@20']}")
log(f"  mem: {mem_mb()}")

t0 = time.time()
s = StudentConfig(
    datasets=DS, dataset_dir=tmp, runs=1, epochs=4, eval_steps=4,
    patience=100, hidden_channels=128, link_batch_size=64 * 1024,
    minibatch=True, compute_dtype="bfloat16",
    save_dir=tmp + "/saved", results_dir=tmp + "/results", log_steps=1000,
)
ss = run_student(s, verbose=False)[0]
log(f"student N=1M (minibatch bf16) done in {time.time() - t0:.0f}s")
log(f"  AUC {ss['AUC']}  Hits@20 {ss['Hits@20']}")
log(f"  mem: {mem_mb()}")
log("DONE")
