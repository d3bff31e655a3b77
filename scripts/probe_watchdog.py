"""Round-5 diagnostic 8: is there a ~60 s single-program execution watchdog?

Every epoch crash in this session died 60-64 s after dispatch regardless of
structure/dtype/memory; all programs under ~60 s pass.  Run a dummy matmul
fori_loop sized for ~30 s, then ~90 s of device time.  A crash on the long
one (and only it) confirms the watchdog — the fix is then segmenting long
epochs into sub-60 s programs, not kernel work.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_watchdog.py <log>
"""

import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_watchdog.log"
LOG = open(OUT, "a", buffering=1)


def log(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

log(f"=== probe_watchdog start; devices: {jax.devices()}")

a = jnp.ones((4096, 4096), jnp.bfloat16)


def chain(n):
    def f(x):
        def body(_, y):
            return jnp.tanh(y @ a)

        return jax.lax.fori_loop(0, n, body, x)

    return jax.jit(f)


# Calibrate: one 4096^3 bf16 matmul ~ 0.14 GFLOP*2... measure 2k iterations
t0 = time.time()
f2k = chain(2000)
y = f2k(a)
v = float(y[0, 0].astype(jnp.float32))
dt = time.time() - t0
log(f"calibrate 2000 iters: {dt:.1f}s (incl compile) v={v:.3f}")
t0 = time.time()
y = f2k(a)
v = float(y[0, 0].astype(jnp.float32))
per = (time.time() - t0) / 2000
log(f"2000 iters warm: {time.time() - t0:.1f}s ({per * 1e3:.2f} ms/iter)")

for target in (30.0, 90.0, 150.0):
    n = max(1, int(target / per))
    try:
        t0 = time.time()
        fn = chain(n)
        y = fn(a)
        v = float(y[0, 0].astype(jnp.float32))
        log(f"target {target:.0f}s ({n} iters): OK in {time.time() - t0:.1f}s")
    except Exception as ex:  # noqa: BLE001
        log(f"target {target:.0f}s ({n} iters): FAILED after "
            f"{time.time() - t0:.1f}s: {str(ex)[:200]}")
        break
log("DONE")
