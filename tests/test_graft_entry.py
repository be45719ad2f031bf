"""Driver-gate regression tests for __graft_entry__.

The round-1 multi-chip gate failed (MULTICHIP_r01.json rc=1) because
``dryrun_multichip`` refused to run with fewer physical devices than
requested instead of provisioning a virtual CPU mesh. These tests pin the
self-provisioning behavior: the dry run must pass from a 1-device process.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_runs_in_process_with_enough_devices():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g

        g.dryrun_multichip(4)  # conftest provisions 8 CPU devices
    finally:
        sys.path.remove(REPO)


def test_dryrun_multichip_self_provisions_from_single_device():
    # Parent subprocess: plain CPU platform with ONE device and no
    # XLA_FLAGS — dryrun_multichip(4) must detect the shortfall and
    # re-exec itself with a forced 4-device virtual CPU platform.
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g; g.dryrun_multichip(4)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip OK" in proc.stdout
