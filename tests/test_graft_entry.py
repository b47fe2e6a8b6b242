"""The driver-facing entry points must work in a pristine process.

``dryrun_multichip`` must self-provision its virtual device mesh: the driver
calls it on an image whose default JAX platform is one real TPU chip, so the
entry itself is responsible for forcing the CPU backend and the
``--xla_force_host_platform_device_count`` flag (round-1 RED signal,
VERDICT.md item 1).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_clean(code: str, extra_env: dict | None = None):
    """Run ``code`` in a fresh interpreter WITHOUT the conftest's CPU forcing."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env.update(extra_env or {})
    # 1800 s: the interpret-mode legs take ~6 min solo but the suite can
    # run beside a chip job's host feeder on this single-core image — the
    # round-5 full-suite run saw all three cases blow a 600 s budget from
    # contention alone (they pass solo).
    return subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=1800)


pytestmark = pytest.mark.slow  # each case pays a fresh-interpreter JAX start


@pytest.mark.parametrize("n", [8, 4])
def test_dryrun_multichip_self_provisions(n):
    r = _run_clean(
        f"import __graft_entry__ as g; g.dryrun_multichip({n})")
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert f"dryrun_multichip({n})" in r.stdout and "ok" in r.stdout


def test_dryrun_multichip_respects_caller_flags():
    # Driver style: caller already set the host device count itself.
    r = _run_clean(
        "import __graft_entry__ as g; g.dryrun_multichip(8)",
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "ok" in r.stdout
