"""Round-3 tail TPU batch: the 16-trial sweep + a full bench.py validation
run, chained in ONE process (each process exit wedges the axon relay for
10-20 min — batching is the protocol).

Usage: python scripts/r3_tail.py /tmp/r3_tail.log
Writes the sweep to docs/sample-results/sweep_cora_r3.json (sweep_r3.py)
and the bench JSON line to /tmp/bench_r3_validate.json.
"""

import io
import runpy
import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3_tail.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

log("=== phase 1: sweep_r3 ===")
sys.argv = ["sweep_r3.py", OUT]
try:
    runpy.run_path("/root/repo/scripts/sweep_r3.py", run_name="__main__")
except SystemExit:
    pass
except Exception as ex:  # noqa: BLE001
    import traceback

    log(f"sweep FAILED {type(ex).__name__}: {str(ex)[:300]}")
    log(traceback.format_exc()[-600:])

log("=== phase 2: bench.py validation (full, with gates) ===")
buf = io.StringIO()
stdout = sys.stdout
sys.stdout = buf
try:
    sys.argv = ["bench.py"]
    runpy.run_path("/root/repo/bench.py", run_name="__main__")
except SystemExit:
    pass
except Exception as ex:  # noqa: BLE001
    import traceback

    sys.stdout = stdout
    log(f"bench FAILED {type(ex).__name__}: {str(ex)[:300]}")
    log(traceback.format_exc()[-800:])
finally:
    sys.stdout = stdout

out = buf.getvalue().strip()
log(f"bench output: {out[-2000:]}")
if out:
    lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    if lines:
        with open("/tmp/bench_r3_validate.json", "w") as f:
            f.write(lines[-1] + "\n")
log("DONE")
