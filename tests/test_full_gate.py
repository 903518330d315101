"""Machine-check EVERY declared query against its DuckDB oracle at
sf0.001 on every test run — so queries the driver has never sampled
are still gated per commit (the driver samples a subset per round;
this is the local full replica of that gate).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_oracle import run_gate  # noqa: E402


def test_all_queries_oracle_green(spark):
    failing = run_gate(spark, "/root/testdata/sf0.001", verbose=False)
    assert not failing, "\n".join(
        f"{name}: {'; '.join(issues)}" for name, issues in failing.items()
    )
