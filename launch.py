"""Cluster launcher (reference launch.py:6-65 + common/launch_utils.py).

Modes:
  * ``python``   — run in-process (single host; JAX uses all local chips)
  * ``spmd``     — multi-host TPU slice: each host runs this same command;
                   jax.distributed.initialize() picks up the TPU pod topology
                   (replaces the reference's `accelerate launch` rank plumbing)
  * ``submitit`` — SLURM submission of the spmd mode (requires submitit)

On TPU pods there is no per-GPU process spawning: ONE process per host, all
chips driven through jit over the mesh — which is why ``accelerate_launch``'s
--num_processes/--machine_rank machinery has no equivalent here.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv=None):
    parser = argparse.ArgumentParser("sceneverse_tpu launcher")
    parser.add_argument("--mode", default="python",
                        choices=["python", "spmd", "submitit"])
    parser.add_argument("--config", required=True)
    parser.add_argument("--name", default="sceneverse")
    parser.add_argument("--time", default=24 * 60, type=int, help="SLURM minutes")
    parser.add_argument("--partition", default="tpu")
    parser.add_argument("--nodes", default=1, type=int)
    parser.add_argument("--coordinator", default=None,
                        help="coordinator_address host:port for spmd mode")
    parser.add_argument("--port", default=8476, type=int,
                        help="coordinator port for SLURM-derived topology "
                             "(reference --main_process_port, "
                             "launch_utils.py:31)")
    parser.add_argument("--num-processes", default=None, type=int)
    parser.add_argument("--process-id", default=None, type=int)
    parser.add_argument("--mixed_precision", default=None,
                        choices=["no", "fp16", "bf16"],
                        help="reference launch.py:51-52; fp16 maps to bf16 "
                             "(TPU-native 16-bit type)")
    parser.add_argument("opts", nargs="*", help="config overrides key=val")
    args = parser.parse_args(argv)
    if args.mixed_precision:
        args.opts = [*args.opts, f"mixed_precision={args.mixed_precision}"]
    return args


def _run(config: str, opts):
    import run as runner

    cfg_path = "/".join(config.split("/")[:-1]) or "configs"
    cfg_name = config.split("/")[-1]
    return runner.main(["--config-path", cfg_path, "--config-name", cfg_name, *opts])


def python_launch(args):
    return _run(args.config, args.opts)


def spmd_launch(args):
    import jax

    kwargs = {}
    if args.coordinator:
        kwargs = dict(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    jax.distributed.initialize(**kwargs)
    return _run(args.config, args.opts)


class SubmititLauncher:
    """Per-node payload submitit runs on every SLURM task.

    Mirrors the reference's ``SubmititLauncher.__call__``/``_set_gpu_args``
    (common/launch_utils.py:11-47): the reference derives ``machine_rank``
    from ``submitit.JobEnvironment().global_rank`` and the coordinator host
    from the first entry of ``$SLURM_JOB_NODELIST`` (launch_utils.py:16-18,
    44-47). Here the same facts feed ``jax.distributed.initialize`` —
    coordinator = first hostname:port, num_processes = tasks, process_id =
    global rank (one process per TPU host; tasks_per_node=1)."""

    def __init__(self, args):
        self.args = args
        # a user-pinned coordinator is honored verbatim; an auto-derived one
        # must be RE-derived on every __call__ — after a SLURM preemption the
        # requeued job can land on different nodes, and the first
        # allocation's hostname would point jax.distributed at a dead host
        self._user_coordinator = args.coordinator

    def __call__(self):
        import submitit

        env = submitit.JobEnvironment()
        args = self.args
        args.coordinator = (self._user_coordinator
                            if self._user_coordinator is not None
                            else f"{env.hostnames[0]}:{args.port}")
        args.num_processes = env.num_tasks
        args.process_id = env.global_rank
        return spmd_launch(args)

    def checkpoint(self):
        """Requeue on timeout/preemption — the resilience the reference gets
        from slurm_max_num_timeout=30 + signal_delay (launch_utils.py:60,72);
        the re-run resumes from the snapshotted config (run.py resume flow).
        The requeued payload drops any auto-derived coordinator so the new
        allocation derives its own (see __init__)."""
        import submitit

        args = self.args
        args.coordinator = self._user_coordinator
        return submitit.helpers.DelayedSubmission(SubmititLauncher(args))


def submitit_launch(args):
    try:
        import submitit
    except ImportError as e:
        raise SystemExit("submitit not available in this image") from e
    executor = submitit.AutoExecutor(folder=f"slurm/{args.name}")
    executor.update_parameters(
        name=args.name, timeout_min=args.time, nodes=args.nodes,
        slurm_partition=args.partition, tasks_per_node=1,
        slurm_max_num_timeout=30, slurm_signal_delay_s=120,
    )
    job = executor.submit(SubmititLauncher(args))
    print(f"submitted {job.job_id}")
    return job


def main(argv=None):
    args = parse_args(argv)
    return {"python": python_launch, "spmd": spmd_launch,
            "submitit": submitit_launch}[args.mode](args)


if __name__ == "__main__":
    main()
