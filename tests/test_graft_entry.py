"""The driver's actual entry path: ``import __graft_entry__`` then call
``dryrun_multichip(8)`` directly, with NO env pinning.

Round-1 failure mode (VERDICT.md Weak #1): the CPU-platform pinning lived only
under ``if __name__ == "__main__"``, so the driver's direct call initialized
the axon TPU backend and died. This test runs the exact driver call in a
subprocess with JAX_PLATFORMS/XLA_FLAGS stripped, so it fails if the pinning
ever migrates out of ``dryrun_multichip`` again.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_as_driver_calls_it():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")
    }
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        # 4 cold XLA:CPU full-step compiles (fft_glo dp + dp×sp, stn, nemar
        # @128²) serialized on this 1-core box; warm-cache runs take ~2 min
        timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip dp(8):" in proc.stdout, proc.stdout
    assert "dryrun_multichip stn-dp(8):" in proc.stdout, proc.stdout
    assert "dryrun_multichip nemar-dp(8):" in proc.stdout, proc.stdout
    assert "dryrun_multichip dp4xsp2:" in proc.stdout, proc.stdout
