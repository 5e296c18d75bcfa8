"""XPlane trace-analyzer tests (results/xplane.py) on a synthetic XSpace."""

import numpy as np
import pytest

tf_proto = pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")

from whisper_tpu.results import xplane


def _make_xspace():
    xs = tf_proto.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "%fusion.1"
    plane.event_metadata[2].id = 2
    plane.event_metadata[2].name = "%while.9"
    line = plane.lines.add()
    line.name = "XLA Ops"
    for mid, dur_ps in [(1, 2_000_000_000), (2, 5_000_000_000),
                        (1, 1_000_000_000)]:
        ev = line.events.add()
        ev.metadata_id = mid
        ev.duration_ps = dur_ps
    # A CPU plane that must be filtered out.
    cpu = xs.planes.add()
    cpu.name = "/host:CPU"
    return xs


def test_op_totals_sums_and_filters(tmp_path):
    xs = _make_xspace()
    p = tmp_path / "t.xplane.pb"
    p.write_bytes(xs.SerializeToString())

    loaded = xplane.load_xspace(str(tmp_path))  # finds the file in a dir
    totals = xplane.op_totals(loaded)
    assert set(totals) == {"XLA Ops"}
    ops = totals["XLA Ops"]
    assert ops["%fusion.1"] == pytest.approx(3.0)   # 2 + 1 ms
    assert ops["%while.9"] == pytest.approx(5.0)

    rows = xplane.report(str(p), top_n=10)
    assert rows[0] == ("XLA Ops", "%while.9", pytest.approx(5.0))


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        xplane.load_xspace(str(tmp_path))
