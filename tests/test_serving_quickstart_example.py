"""Smoke test for examples/serving_quickstart.py (the PQ variant — it covers
the exact-index variant's path plus fit/rotation/rerank)."""
import os
import subprocess
import sys

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def test_serving_quickstart_pq(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, "serving_quickstart.py"),
         "--cpu", "--pq", "--workdir", str(tmp_path / "sq")],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(EXAMPLES) or ".")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK: self-match at rank 1" in proc.stdout
    assert os.path.exists(str(tmp_path / "sq" / "index.npz"))
