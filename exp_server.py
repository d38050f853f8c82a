"""Throwaway: long-lived TPU experiment server (avoids per-process tunnel
cold-start stalls, which cost minutes).

Watches /tmp/tpu_jobs/ for *.py files, execs each (oldest first by mtime,
one at a time) in this warm process with a shared globals dict, writes
stdout+traceback to <name>.out and renames the job to <name>.done.
Stop with: touch /tmp/tpu_jobs/STOP
"""
import io
import os
import time
import traceback
from contextlib import redirect_stdout, redirect_stderr
from pathlib import Path

os.environ.setdefault("SCENEVERSE_PALLAS_FAST", "1")

import jax  # noqa: E402

JOBS = Path("/tmp/tpu_jobs")
JOBS.mkdir(exist_ok=True, mode=0o700)
# /tmp is world-writable: refuse to serve a directory someone else created,
# and (below) refuse to exec job files not owned by this user.
if JOBS.stat().st_uid != os.getuid():
    raise SystemExit(f"{JOBS} is owned by uid {JOBS.stat().st_uid}, not us")
os.chmod(JOBS, 0o700)

print("warming device...", flush=True)
import jax.numpy as jnp  # noqa: E402
float(jnp.ones((8, 8)).sum())
print("ready", flush=True)

SHARED: dict = {"__name__": "__tpu_exp__"}

while True:
    stop = JOBS / "STOP"
    if stop.exists():
        stop.unlink()
        print("stopping", flush=True)
        break
    jobs = sorted((p for p in JOBS.glob("*.py")
                   if p.stat().st_uid == os.getuid()),
                  key=lambda p: p.stat().st_mtime)
    if not jobs:
        time.sleep(0.5)
        continue
    job = jobs[0]
    out = io.StringIO()
    t0 = time.perf_counter()
    try:
        src = job.read_text()
        with redirect_stdout(out), redirect_stderr(out):
            exec(compile(src, str(job), "exec"), SHARED)
        status = "ok"
    except Exception:
        out.write(traceback.format_exc())
        status = "error"
    dt = time.perf_counter() - t0
    (job.with_suffix(".out")).write_text(
        out.getvalue() + f"\n[{status} in {dt:.1f}s]\n")
    job.rename(job.with_suffix(".done"))
    print(f"{job.name}: {status} {dt:.1f}s", flush=True)
    # reclaim HBM between jobs unless the job opts out with KEEP_STATE=True:
    # jit caches + SHARED refs otherwise accumulate until device OOM, which
    # wedges the axon client for the rest of the process
    if not SHARED.pop("KEEP_STATE", False):  # one-shot flag
        import gc
        import sys
        for k in list(SHARED.keys()):
            if not k.startswith("__"):
                del SHARED[k]
        # purge repo modules so the next job re-imports current sources
        for name in list(sys.modules):
            if name.split(".")[0] in ("sceneverse_tpu", "bench",
                                      "bench_towers", "bench_latency",
                                      "bench_pipeline", "__graft_entry__"):
                del sys.modules[name]
        jax.clear_caches()
        gc.collect()
        for a in jax.live_arrays():
            a.delete()
        gc.collect()
