"""Scaling-efficiency harness across PROCESS topologies.

Runs the global-mesh teacher-step measurement (``python -m
llp_tpu.parallel.multihost``) at (a) 1 process × 2K devices and (b) 2
processes × K devices — same total device count, so the efficiency ratio
isolates the cross-process collective cost. On real multi-host TPU the same
per-host entry point is launched once per host with ``--coordinator`` etc.;
here the two processes are local with virtual CPU devices, which validates
the machinery (Gloo transport standing in for DCN) — absolute CPU numbers do
not predict TPU throughput.

    python scripts/measure_scaling_multiproc.py [devices_per_process=4]
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_topology(n_procs: int, dev_per_proc: int) -> dict:
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={dev_per_proc}",
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
        JAX_COMPILATION_CACHE_DIR="",
    )
    base = [sys.executable, "-m", "llp_tpu.parallel.multihost"]
    if n_procs == 1:
        out = subprocess.run(base, env=env, cwd=REPO, capture_output=True,
                             text=True, timeout=300)
        procs_out = [out]
    else:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        flags = [f"--coordinator=127.0.0.1:{port}",
                 f"--num_processes={n_procs}"]
        handles = [
            subprocess.Popen(base + flags + [f"--process_id={i}"], env=env,
                             cwd=REPO, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True)
            for i in range(n_procs)
        ]
        procs_out = []
        for h in handles:
            stdout, _ = h.communicate(timeout=300)
            procs_out.append(
                subprocess.CompletedProcess(h.args, h.returncode, stdout, "")
            )
    for o in procs_out:
        if o.returncode != 0:
            raise RuntimeError(f"{o.args} failed:\n{o.stdout[-2000:]}")
    line = [ln for o in procs_out for ln in o.stdout.splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    single = run_topology(1, 2 * k)      # 1 process x 2K devices
    multi = run_topology(2, k)           # 2 processes x K devices
    eff = multi["edges_per_sec"] / single["edges_per_sec"]
    print(json.dumps({
        "devices_total": 2 * k,
        "single_process": single,
        "two_process": multi,
        "cross_process_efficiency": round(eff, 3),
        "note": "CPU/Gloo topology validation; absolute numbers are not "
                "TPU-predictive",
    }))


if __name__ == "__main__":
    main()
