"""Driver-contract regression: ``__graft_entry__.dryrun_multichip(n)`` must
self-provision its n-device mesh when called as a plain function in a fresh
process with the default (axon-site) environment — exactly how the round
driver invokes it (see VERDICT round 1: MULTICHIP_r01 failed on this).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_provisions():
    env = dict(os.environ)
    # Simulate the driver: no virtual-device XLA flags, no platform override.
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    env["PALLAS_AXON_POOL_IPS"] = ""  # stay off the TPU tunnel in tests
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(8)" in r.stdout, r.stdout
