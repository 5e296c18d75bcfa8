"""Summarize driver-recorded round benchmarks (BENCH_r*.json).

The headline e2e is WIRE-bound and the tunnel's H2D rate varies 12-51
MB/s between sessions (docs/UPLOAD_PIPELINE.md), so raw x-realtime
numbers are not comparable across rounds.  bench.py emits wire_mbps /
model_s / preprocess_s context fields (round 3+); this tool prints the
rounds side by side with a link-normalized view: model_s is the
device-side time (what the framework actually controls), preprocess_s
is mostly the wire.

Usage: python results/rounds.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main(argv=None) -> int:
    root = (argv or sys.argv[1:] or ["."])[0]
    paths = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    if not paths:
        print("no BENCH_r*.json found", file=sys.stderr)
        return 1
    rows = []
    for p in paths:
        name = os.path.basename(p).replace("BENCH_", "").replace(".json", "")
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError) as e:
            print(f"{name}: unreadable ({e})", file=sys.stderr)
            continue
        # Driver wrapper nests the bench line under "parsed".
        if "value" not in d and isinstance(d.get("parsed"), dict):
            d = d["parsed"]
        rows.append((name, d))
    print(f"{'round':6s} {'x_real':>8s} {'vs_ref':>7s} {'model_s':>8s} "
          f"{'preproc_s':>9s} {'wire_MB/s':>9s}")
    for name, d in rows:
        def g(key, fmt="{:.3f}"):
            v = d.get(key)
            return fmt.format(v) if isinstance(v, (int, float)) else "-"
        print(f"{name:6s} {g('value', '{:.1f}'):>8s} "
              f"{g('vs_baseline', '{:.1f}'):>7s} {g('model_s'):>8s} "
              f"{g('preprocess_s'):>9s} {g('wire_mbps', '{:.0f}'):>9s}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
