"""scratch_dir contract: per-process-unique root, per-name reuse within
a process — the properties that stop concurrent bench/driver processes
racing each other's sink paths without accumulating a copy per call."""

import os
import subprocess
import sys

from builder_spark.scratch import scratch_dir


def test_same_name_reuses_within_process():
    a, b = scratch_dir("x"), scratch_dir("x")
    assert a == b
    assert scratch_dir("y") != a
    assert os.path.isdir(os.path.dirname(a))


def test_distinct_across_processes():
    code = (
        "from builder_spark.scratch import scratch_dir; print(scratch_dir('x'))"
    )
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    others = {
        subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, env=env,
            check=True,
        ).stdout.strip()
        for _ in range(2)
    }
    assert len(others) == 2
    assert scratch_dir("x") not in others


def test_root_is_private():
    root = os.path.dirname(scratch_dir("x"))
    assert (os.stat(root).st_mode & 0o777) == 0o700
