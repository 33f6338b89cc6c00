"""StatusLog / Throughput unit coverage (the observability layer)."""

import json
import threading

from f9tpu.pipeline.logbook import StatusLog, Throughput


def test_statuslog_basic(tmp_path):
    jl = str(tmp_path / "events.jsonl")
    sink_lines = []
    log = StatusLog(sink=sink_lines.append, jsonl_path=jl)
    log.append("hello", stage="test")
    log.append("world")
    assert len(log.lines) == 2
    assert "hello" in log.text() and "world" in log.text()
    assert sink_lines[0].endswith("hello")
    # timestamped prefix: [ISO8601]
    assert log.lines[0].startswith("[20")
    with open(jl) as f:
        events = [json.loads(line) for line in f]
    assert events[0]["msg"] == "hello" and events[0]["stage"] == "test"


def test_statuslog_thread_safety():
    log = StatusLog()
    def worker(i):
        for j in range(50):
            log.append(f"w{i}-{j}")
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads: t.start()
    for t in threads: t.join()
    assert len(log.lines) == 200


def test_throughput_summary():
    tp = Throughput()
    tp.add("decode", 10.0, 2.0)
    tp.add("decode", 10.0, 2.0)
    tp.add("device", 20.0, 0.01)
    s = tp.summary()
    assert s["decode"]["audio_seconds"] == 20.0
    assert abs(s["decode"]["x_realtime"] - 5.0) < 1e-9
    assert s["device"]["x_realtime"] > 1000


def test_status_log_max_lines_cap():
    """Serving mode (watch) caps in-memory retention; the sink still sees
    every line."""
    from f9tpu.pipeline.logbook import StatusLog

    sunk = []
    log = StatusLog(sink=sunk.append, max_lines=10)
    for i in range(25):
        log.append(f"line {i}")
    assert len(sunk) == 25
    kept = log.lines
    assert len(kept) == 10
    assert kept[-1].endswith("line 24") and kept[0].endswith("line 15")
