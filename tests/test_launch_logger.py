"""Exercise the env-gated surfaces with stub modules: the submitit launch
backend (reference launch.py:30-49 SLURM path) and the wandb logger branch
(reference trainer/build.py:77-81). Neither package ships in this image, so
these tests inject fakes into sys.modules — the point is that OUR wiring
(executor parameters, job submission target, wandb init/log/finish calls)
executes, not the third-party internals.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def test_submitit_launch_with_stub(monkeypatch, tmp_path):
    calls = {}

    class _Job:
        job_id = "4242"

    class _AutoExecutor:
        def __init__(self, folder):
            calls["folder"] = folder

        def update_parameters(self, **kw):
            calls["params"] = kw

        def submit(self, fn, *args):
            calls["submit"] = (fn, args)
            return _Job()

    stub = types.ModuleType("submitit")
    stub.AutoExecutor = _AutoExecutor
    monkeypatch.setitem(sys.modules, "submitit", stub)

    import launch

    args = launch.parse_args([
        "--mode", "submitit", "--config", "configs/final/debug.yaml",
        "--name", "testjob", "--time", "60", "--nodes", "2",
        "--partition", "tpu-pod", "--mixed_precision", "fp16",
    ])
    job = launch.submitit_launch(args)

    assert job.job_id == "4242"
    assert calls["folder"] == "slurm/testjob"
    assert calls["params"]["nodes"] == 2
    assert calls["params"]["timeout_min"] == 60
    assert calls["params"]["slurm_partition"] == "tpu-pod"
    assert calls["params"]["tasks_per_node"] == 1  # one process per TPU host
    fn, fnargs = calls["submit"]
    assert isinstance(fn, launch.SubmititLauncher) and fnargs == ()
    assert calls["params"]["slurm_max_num_timeout"] == 30
    assert calls["params"]["slurm_signal_delay_s"] == 120
    # fp16 maps to bf16's config override surface (reference launch.py:51-52)
    assert "mixed_precision=fp16" in args.opts

    # --- per-node payload: replay the submitted callable on each of the
    # 2 nodes with a fake SLURM JobEnvironment and assert the derived
    # jax.distributed topology (reference launch_utils.py:16-18,44-47 derives
    # machine_rank/main_process_ip the same way) ---
    class _JobEnv:
        hostnames = ["node-a", "node-b"]
        num_tasks = 2

        def __init__(self, rank):
            self.global_rank = rank

    spmd_calls = []
    monkeypatch.setattr(launch, "spmd_launch",
                        lambda a: spmd_calls.append(
                            (a.coordinator, a.num_processes, a.process_id)))
    for rank in range(2):
        stub.JobEnvironment = lambda r=rank: _JobEnv(r)
        node_args = launch.parse_args([
            "--mode", "submitit", "--config", "configs/final/debug.yaml",
            "--nodes", "2",
        ])
        launch.SubmititLauncher(node_args)()
    assert spmd_calls == [("node-a:8476", 2, 0), ("node-a:8476", 2, 1)]

    # requeue-on-preemption hook (reference slurm_max_num_timeout semantics)
    resubs = []
    helpers = types.ModuleType("submitit.helpers")

    class _Delayed:
        def __init__(self, fn):
            resubs.append(fn)

    helpers.DelayedSubmission = _Delayed
    stub.helpers = helpers
    monkeypatch.setitem(sys.modules, "submitit.helpers", helpers)
    launch.SubmititLauncher(args).checkpoint()
    assert len(resubs) == 1 and isinstance(resubs[0], launch.SubmititLauncher)

    # preemption resilience: after __call__ derived node-a as coordinator,
    # a requeue that lands on DIFFERENT nodes must re-derive the coordinator
    # from the new allocation, not point jax.distributed at dead node-a
    node_args = launch.parse_args([
        "--mode", "submitit", "--config", "configs/final/debug.yaml",
        "--nodes", "2",
    ])
    payload = launch.SubmititLauncher(node_args)
    stub.JobEnvironment = lambda: _JobEnv(0)  # first allocation: node-a/b
    spmd_calls.clear()
    payload()
    payload.checkpoint()
    requeued = resubs[-1]
    assert requeued.args.coordinator is None  # auto-derived -> dropped

    class _JobEnv2(_JobEnv):
        hostnames = ["node-x", "node-y"]

    stub.JobEnvironment = lambda: _JobEnv2(1)
    requeued()
    assert spmd_calls[-1] == ("node-x:8476", 2, 1)

    # a user-pinned coordinator survives requeue verbatim
    pinned = launch.parse_args([
        "--mode", "submitit", "--config", "configs/final/debug.yaml",
        "--coordinator", "pinned-host:1234",
    ])
    p2 = launch.SubmititLauncher(pinned)
    p2()
    assert spmd_calls[-1][0] == "pinned-host:1234"
    p2.checkpoint()
    assert resubs[-1].args.coordinator == "pinned-host:1234"


def test_wandb_logger_branch_with_stub(monkeypatch, tmp_path):
    events = []

    class _Run:
        def log(self, metrics, step=None):
            events.append(("log", dict(metrics), step))

        def finish(self):
            events.append(("finish",))

    stub = types.ModuleType("wandb")

    def _init(**kw):
        events.append(("init", kw))
        return _Run()

    stub.init = _init
    monkeypatch.setitem(sys.modules, "wandb", stub)

    from sceneverse_tpu.config import Config
    from sceneverse_tpu.utils.logger import MetricsLogger

    cfg = Config({
        "name": "proj", "exp_dir": str(tmp_path), "resume": False,
        "logger": {"name": "wandb"}, "debug": {"hard_debug": False},
    })
    logger = MetricsLogger(cfg, exp_name="exp1")
    logger.log({"loss": np.float32(1.5)}, step=3)
    logger.finish()

    kinds = [e[0] for e in events]
    assert kinds == ["init", "log", "finish"]
    assert events[0][1]["project"] == "proj"
    assert events[0][1]["name"] == "exp1"
    assert events[1][2] == 3
    # the JSONL sink is written regardless of wandb
    assert (tmp_path / "metrics.jsonl").read_text().count('"loss"') == 1
