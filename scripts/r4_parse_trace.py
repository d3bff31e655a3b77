"""Parse the docs/traces/r4 jax.profiler capture OFFLINE (no TPU session).

Uses the installed xprof converter to turn the xplane.pb into the
framework-op-stats and overview tools, and prints a top-op summary (time
share, MXU vs memory-bound classification where available).

Usage: python scripts/r4_parse_trace.py [trace_dir]
MUST run CPU-only: forces jax off before anything imports it (no jax
import needed at all, actually — keep it that way).
"""

import glob
import json
import os
import sys

trace_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "traces", "r4",
)

planes = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                          recursive=True))
if not planes:
    sys.exit(f"no xplane.pb under {trace_dir}")
print("xplane files:")
for p in planes:
    print("  ", p, f"{os.path.getsize(p) / 1e6:.1f} MB")

from xprof.convert import raw_to_tool_data  # noqa: E402

params = {"tqx": "out:csv;"}
for tool in ("framework_op_stats", "op_profile", "overview_page"):
    for suffix in ("^", ""):
        try:
            data, ctype = raw_to_tool_data.xspace_to_tool_data(
                planes, tool + suffix, params
            )
        except Exception as exc:  # noqa: BLE001
            print(f"[{tool}{suffix}] failed: {exc!r}")
            continue
        out = os.path.join(trace_dir, f"{tool}.{ 'csv' if 'csv' in str(ctype) else 'json'}")
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print(f"[{tool}{suffix}] -> {out} ({len(data)} bytes, {ctype})")
        break

# Print a quick top-10 from the framework op stats CSV if present
csvp = os.path.join(trace_dir, "framework_op_stats.csv")
if os.path.exists(csvp):
    import csv

    with open(csvp) as f:
        rows = list(csv.DictReader(f))
    key = next(
        (k for k in rows[0] if "self" in k.lower() and "time" in k.lower()),
        None,
    )
    if key:
        rows.sort(key=lambda r: float(r.get(key) or 0), reverse=True)
        print(f"\ntop-10 ops by {key}:")
        for r in rows[:10]:
            print("  ", json.dumps({k: r[k] for k in list(r)[:6]}))
