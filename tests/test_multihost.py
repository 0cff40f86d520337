"""Multi-process execution of the multi-host runtime (SURVEY.md §2.9).

Launches a REAL 2-process CPU cluster (localhost coordinator, one CPU
device per process) and runs parallel.multihost's multi-process branch
end-to-end: jax.distributed.initialize, make_pod_mesh across processes,
per_host_batch_slice, shard_host_data
(jax.make_array_from_process_local_data), and one data-parallel
SelectionGNN gradient step — the exact code path a TPU pod uses.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "helpers", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_cluster_dp_step():
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # 1 local CPU device per process
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(nproc), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        text=True) for i in range(nproc)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [l for l in out.strip().splitlines()
                if l.startswith("{")][-1]
        outs.append(json.loads(line))
    assert all(o["process_count"] == nproc for o in outs)
    assert all(o["devices"] == nproc for o in outs)
    # both processes computed the same global loss/grads, equal to the
    # single-device full-batch reference
    np.testing.assert_allclose(outs[0]["loss"], outs[1]["loss"],
                               rtol=1e-6)
    np.testing.assert_allclose(outs[0]["gnorm"], outs[1]["gnorm"],
                               rtol=1e-6)
    np.testing.assert_allclose(outs[0]["loss"], outs[0]["loss_ref"],
                               rtol=1e-5)
