"""tools/isolation.py — the measurement-exclusivity guard (r13 verdict,
What's wrong #2: a concurrent Spark job silently contaminated a full
sf10 ladder ~3x; the rule now lives in the tools, not in prose)."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from isolation import LOAD_THRESHOLD, foreign_compute_pids, snapshot


def test_snapshot_shape():
    s = snapshot()
    assert set(s) == {"loadavg", "foreign_jvms", "foreign_spark_pythons",
                      "contaminated"}
    assert len(s["loadavg"]) == 3
    assert isinstance(s["contaminated"], bool)


def test_own_tree_not_foreign():
    """A child of this process running a 'spark'-named python cmdline must
    NOT count as foreign compute (the bench's own driver JVM pattern)."""
    child = subprocess.Popen(
        [sys.executable, "-c",
         "import time, sys; sys.argv=['pyspark-worker']; time.sleep(15)"],
    )
    try:
        pids = foreign_compute_pids()
        assert child.pid not in pids["jvm_pids"]
        assert child.pid not in pids["spark_python_pids"]
    finally:
        child.kill()
        child.wait()


def test_end_snapshot_ignores_load():
    """End-of-leg stamps key on foreign processes only — the leg's own
    just-finished work inflates the 1m load average."""
    s = snapshot(check_load=False)
    if s["foreign_jvms"] == 0 and s["foreign_spark_pythons"] == 0:
        assert s["contaminated"] is False


def test_threshold_is_sane():
    assert 1.0 < LOAD_THRESHOLD < 33.0  # between idle and the 32-cpu box
