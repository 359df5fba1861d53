"""Measurement-exclusivity guard (r13 verdict, What's wrong #2).

Round 13 lost a full sf10 ladder to a concurrently-running Spark job:
every ratio read ~3x high and nothing in the artifacts recorded that the
box was busy — the contamination was only caught because a human noticed
the anomaly. This module makes exclusivity a TOOL property instead of a
prose rule:

- ``snapshot()`` records os.getloadavg() plus the number of JVM and
  foreign-Spark-Python processes that are NOT in this process's own
  tree, so every bench artifact carries the evidence needed to judge it.
- ``assert_exclusive()`` hard-fails a ladder run when foreign JVMs are
  present or the 1-minute load average says the box is already working.
  ``AEGISTHUS_ALLOW_BUSY=1`` overrides (the artifact still records the
  busy snapshot, so the override is visible, not silent).

"Foreign" = a process whose ancestor chain does not include this
process: the bench's own Spark driver JVM (a child of the python
process) never counts against itself.
"""

from __future__ import annotations

import os

#: 1-minute load above this at ladder start means something else is
#: already computing on the box (the legs themselves start from idle)
LOAD_THRESHOLD = 8.0


def _proc_info() -> list[tuple[int, int, str]]:
    """(pid, ppid, comm) for every readable /proc entry."""
    out = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as f:
                stat = f.read()
            # comm is parenthesised and may contain spaces — split around it
            lp, rp = stat.index("("), stat.rindex(")")
            comm = stat[lp + 1 : rp]
            ppid = int(stat[rp + 2 :].split()[1])
            out.append((int(entry), ppid, comm))
        except (OSError, ValueError):
            continue  # raced with process exit
    return out


def _cmdline(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            return f.read().replace(b"\x00", b" ").decode(errors="replace")
    except OSError:
        return ""


def foreign_compute_pids() -> dict:
    """JVMs and Spark-running Python processes outside this process tree."""
    procs = _proc_info()
    parent = {pid: ppid for pid, ppid, _ in procs}
    me = os.getpid()

    # my own ancestors (the ladder wrapper / driver that launched this
    # process) are part of this invocation chain, not foreign compute
    ancestors = set()
    p, seen = me, 0
    while p > 1 and seen < 64:
        ancestors.add(p)
        p = parent.get(p, 1)
        seen += 1

    def in_my_tree(pid: int) -> bool:
        seen = 0
        while pid > 1 and seen < 64:
            if pid == me:
                return True
            pid = parent.get(pid, 1)
            seen += 1
        return False

    jvms, spark_pys = [], []
    for pid, _ppid, comm in procs:
        if pid in ancestors or in_my_tree(pid):
            continue
        if comm == "java":
            jvms.append(pid)
        elif comm.startswith("python"):
            cmd = _cmdline(pid)
            if "pyspark" in cmd or "spark" in cmd.lower():
                spark_pys.append(pid)
    return {"jvm_pids": jvms, "spark_python_pids": spark_pys}


def snapshot(*, check_load: bool = True) -> dict:
    """The isolation stamp embedded in every bench/ladder artifact.

    ``check_load=False`` for END-of-run stamps: the leg's own
    just-finished work inflates the 1-minute load average, so an end
    stamp keys contamination on foreign processes only (a foreign job
    that STARTED mid-leg is exactly what it exists to catch)."""
    la1, la5, la15 = os.getloadavg()
    foreign = foreign_compute_pids()
    return {
        "loadavg": [round(la1, 2), round(la5, 2), round(la15, 2)],
        "foreign_jvms": len(foreign["jvm_pids"]),
        "foreign_spark_pythons": len(foreign["spark_python_pids"]),
        "contaminated": bool(
            foreign["jvm_pids"]
            or foreign["spark_python_pids"]
            or (check_load and la1 > LOAD_THRESHOLD)
        ),
    }


def assert_exclusive(context: str) -> dict:
    """Refuse to start a measurement leg on a busy box (override:
    AEGISTHUS_ALLOW_BUSY=1 — the snapshot still records the truth)."""
    snap = snapshot()
    if snap["contaminated"] and os.environ.get("AEGISTHUS_ALLOW_BUSY") != "1":
        raise SystemExit(
            f"{context}: box is not exclusive "
            f"(loadavg={snap['loadavg']}, foreign_jvms={snap['foreign_jvms']}, "
            f"foreign_spark_pythons={snap['foreign_spark_pythons']}); "
            "measurements here would be contaminated — finish/kill the "
            "other work, or set AEGISTHUS_ALLOW_BUSY=1 to record anyway "
            "(the artifact will carry contaminated=true)"
        )
    return snap
