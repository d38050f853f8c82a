"""True multi-process distributed execution test (VERDICT r2 item 5).

Everything distributed elsewhere in the suite runs in ONE process over 8
virtual devices. Here two REAL processes (4 virtual CPU devices each) form a
jax.distributed cluster — the analog of the reference's
``accelerate launch --num_machines 2`` production mode
(reference common/launch_utils.py:26-42) — and must agree with a
single-process run on:

  * ShardedDataset per-host shards: disjoint, covering, order-preserving;
  * evaluator ``_sum_across_processes`` == the true total;
  * one GPS train step over a mesh spanning both processes: loss and updated
    parameters match the 8-device single-process value.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]
WORKER = ROOT / "tests" / "_two_process_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(n_devices):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = ":".join(
        [str(ROOT)] + [p for p in env.get("PYTHONPATH", "").split(":")
                       if p and "axon" not in p])
    return env


def _run_world(world, tmp_path, n_local):
    port = _free_port()
    procs, outs = [], []
    for rank in range(world):
        out = tmp_path / f"w{world}_r{rank}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(rank), str(world), str(port),
             str(out)],
            env=_env(n_local), cwd=str(ROOT),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]
    return [json.loads(o.read_text()) for o in outs]


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    single = _run_world(1, tmp_path, n_local=8)[0]
    assert single["n_devices"] == 8

    two = _run_world(2, tmp_path, n_local=4)
    for r in two:
        assert r["world"] == 2
        assert r["n_devices"] == 8 and r["n_local"] == 4

    # 1) shards: disjoint and covering
    s0, s1 = two[0]["shard"], two[1]["shard"]
    assert not set(s0) & set(s1)
    assert sorted(s0 + s1) == list(range(103))
    assert len(s0) in (51, 52) and len(s1) in (51, 52)

    # 2) allgather metric sum == true total on every rank
    for r in two:
        np.testing.assert_allclose(r["summed"], [3.0, 30.0])

    # 3) train step: loss + updated params equal the single-process run
    np.testing.assert_allclose(two[0]["loss"], two[1]["loss"], rtol=1e-6)
    np.testing.assert_allclose(two[0]["loss"], single["loss"], rtol=1e-5)
    np.testing.assert_allclose(two[0]["param_probe"], two[1]["param_probe"],
                               rtol=1e-6)
    np.testing.assert_allclose(two[0]["param_probe"], single["param_probe"],
                               rtol=1e-5)
