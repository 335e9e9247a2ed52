"""Multi-chip regression: the full HED^N-GAN and fine-tune steps jitted over
the 8-device CPU mesh (what the driver's dryrun validates)."""
import importlib.util
import os

import jax
import pytest


def test_dryrun_multichip_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh (conftest)")
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)


def test_entry_compiles():
    spec = importlib.util.spec_from_file_location(
        "graft_entry2", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 512)


def test_all_modules_import():
    """Every package module imports cleanly (no broken lazy deps)."""
    import pkgutil
    import gandtr_tpu
    failures = []
    for mod in pkgutil.walk_packages(gandtr_tpu.__path__, "gandtr_tpu."):
        try:
            __import__(mod.name)
        except Exception as exc:
            failures.append((mod.name, str(exc)))
    assert not failures, failures
