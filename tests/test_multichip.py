"""Multi-chip regression: the full HED^N-GAN and fine-tune steps jitted over
the 8-device CPU mesh (what the driver's dryrun validates).

The dryrun runs in a SUBPROCESS: under `-n 6` xdist compile contention the
in-process version could take down its worker ("node down" aborts —
CLAUDE.md); a child process contains any crash, and __graft_entry__'s
__main__ block self-provisions the virtual mesh. The in-process sharded-step
coverage lives in tests/test_dp_train_stage.py.
"""
import importlib.util
import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_8_devices_subprocess():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "8"],
        env=env, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip [hedngan] OK on 8 devices" in proc.stdout
    assert "dryrun_multichip [finetune] OK on 8 devices" in proc.stdout


def test_dryrun_multichip_library_call_self_provisions():
    """Calling dryrun_multichip() as a library from a pre-initialized
    backend with too few devices must re-exec and still succeed (the
    driver's exact failure mode in round 1, MULTICHIP_r01.json rc=1)."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import jax, sys;"
        "jax.config.update('jax_platforms', 'cpu');"
        "assert len(jax.devices()) == 1;"
        "sys.path.insert(0, %r);"
        "import importlib.util;"
        "spec = importlib.util.spec_from_file_location('ge', %r);"
        "m = importlib.util.module_from_spec(spec);"
        "spec.loader.exec_module(m);"
        "m.dryrun_multichip(8)"
    ) % (REPO, os.path.join(REPO, "__graft_entry__.py"))
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip [finetune] OK on 8 devices" in proc.stdout


def test_entry_compiles():
    spec = importlib.util.spec_from_file_location(
        "graft_entry2", os.path.join(REPO, "__graft_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 512)
