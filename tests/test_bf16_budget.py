"""bf16 production-numerics regression gate (VERDICT r2 item 3).

The measurement harness lives in scripts/bf16_budget.py (it must own the
process: the suite-wide conftest forces the CPU platform, and the budget is
only meaningful on the chip). This tpu-marked test shells out to it with
--assert, which exits nonzero if any stage's bf16-vs-fp32 q99 relative
error exceeds the tolerance recorded in NUMERICS.md.
"""
import os
import subprocess
import sys

import pytest


@pytest.mark.tpu
def test_bf16_error_budget_within_recorded_tolerances():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "bf16_budget.py"),
         "--assert"],
        cwd=root, env=env, capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
