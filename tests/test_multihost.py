"""Multi-host (multi-process) mesh: real separate processes with gloo
collectives on CPU (SURVEY.md §5.8 — the TPU-native scaling story the
single-device reference lacks; on real hardware the same code path spans
hosts of a slice via ICI/DCN).

Each worker process calls `parallel.mesh.init_distributed`, contributes its
local devices to one global mesh, assembles its local batch slice into a
global jax.Array via `global_batch_array`, and jits a computation whose
result depends on EVERY process's data — asserting against the analytically
known full-batch value proves the cross-process collectives really ran.

Runs in subprocesses (like test_multichip) so the parent's initialized
backend and xdist workers are unaffected.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
from gandtr_tpu.parallel import mesh as pmesh

pmesh.init_distributed(coordinator_address="127.0.0.1:" + port,
                       num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc

import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = pmesh.make_mesh()  # all global devices on the "data" axis
global_batch = 8
local_n = pmesh.process_local_batch(global_batch)
assert local_n == global_batch // nproc

# rows [pid*local_n, (pid+1)*local_n) of the deterministic global batch
full = np.arange(global_batch * 3, dtype=np.float32).reshape(global_batch, 3)
local = full[pid * local_n:(pid + 1) * local_n]
garr = pmesh.global_batch_array(mesh, local)
assert garr.shape == (global_batch, 3)

# batch-mean of squares: needs every process's rows
out = jax.jit(lambda x: jnp.mean(x * x),
              out_shardings=NamedSharding(mesh, P()))(garr)
expect = float(np.mean(full * full))
got = float(out)
assert abs(got - expect) < 1e-4, (got, expect)
print("MULTIHOST-OK", pid, got, flush=True)
"""


@pytest.mark.serial
def test_two_process_global_mesh(tmp_path):
    nproc = 2
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO})
    with socket.socket() as s:  # a port that's free right now
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    procs = [subprocess.Popen([sys.executable, str(script), str(i),
                               str(nproc), port],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env)
             for i in range(nproc)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, "worker failed:\n%s\n%s" % (out, err[-3000:])
        assert "MULTIHOST-OK" in out, out
