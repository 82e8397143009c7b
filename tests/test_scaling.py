"""CI smoke for the scaling-efficiency harness (tools/scaling_bench.py).

Runs the DP and map modes over 1-2 virtual CPU devices with a tiny
workload; asserts the harness completes and reports a well-formed
efficiency curve.  Real numbers come from running it on actual chips.
"""

import json
import os
import subprocess
import sys

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "scaling_bench.py")


def test_scaling_harness_smoke():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    out = subprocess.run(
        [sys.executable, TOOLS, "--frames", "3", "--seqs-per-device", "1",
         "--runs", "1", "--max-devices", "2"],
        capture_output=True, timeout=540, env=env)
    assert out.returncode == 0, out.stderr.decode()[-2000:]
    last = json.loads(out.stdout.decode().strip().splitlines()[-1])
    assert last["metric"] == "scaling"
    for mode in ("dp", "map"):
        assert last["results"][mode]["devices"] == [1, 2]
    assert all(f > 0 for f in last["results"]["dp"]["aggregate_fps"])
