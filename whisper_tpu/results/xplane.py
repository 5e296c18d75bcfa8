"""XPlane trace analyzer — op-level breakdown of jax.profiler traces.

The reference's "profiling" is wall-clock stat blocks (SURVEY.md §5.1);
this tool closes the gap to a real tracer: it parses the .xplane.pb files
that `--profile-dir` (bench CLI) or jax.profiler.trace produce and reports
where device time actually goes, without needing TensorBoard.

Usage:
    python -m whisper_tpu.results.xplane <profile_dir_or_xplane.pb> [top_n]

Output: per-op total device time, sorted, plus per-line totals (the "XLA
Ops" line of the TPU plane is the one that matters for kernel work).
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict
from typing import Dict, List, Tuple


def _find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits: List[str] = []
    for root, _dirs, files in os.walk(path):
        hits += [os.path.join(root, f) for f in files
                 if f.endswith(".xplane.pb")]
    if not hits:
        raise FileNotFoundError(f"no .xplane.pb under {path}")
    return max(hits, key=os.path.getmtime)


def load_xspace(path: str):
    """Parse an .xplane.pb file into an XSpace proto (needs tensorflow)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(_find_xplane(path), "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


def op_totals(xspace, plane_filter: str = "TPU") -> Dict[str, Dict[str, float]]:
    """{line_name: {op_name: total_ms}} for planes whose name matches."""
    out: Dict[str, Dict[str, float]] = {}
    for plane in xspace.planes:
        if plane_filter not in plane.name:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            acc = out.setdefault(line.name, defaultdict(float))
            for ev in line.events:
                acc[meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9
    return out


def report(path: str, top_n: int = 30) -> List[Tuple[str, str, float]]:
    """Print and return [(line, op, ms)] sorted by time."""
    xspace = load_xspace(path)
    totals = op_totals(xspace)
    rows: List[Tuple[str, str, float]] = []
    for line_name, ops in sorted(totals.items()):
        line_total = sum(ops.values())
        print(f"== line '{line_name}': {line_total:.3f} ms total, "
              f"{len(ops)} distinct ops")
        for op, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"   {ms:10.3f} ms  {op}")
            rows.append((line_name, op, ms))
    return rows


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    top_n = int(argv[1]) if len(argv) > 1 else 30
    report(argv[0], top_n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
