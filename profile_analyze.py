"""Aggregate a jax.profiler TPU trace into an op-level time budget.

Usage: python profile_analyze.py /path/to/profile_dir [top_n]

Finds the newest ``*.xplane.pb`` under the directory (the layout
``jax.profiler.trace`` writes), takes the ``/device:TPU:*`` plane, and prints
total device-busy time, a category rollup (pallas custom-calls, fusions,
matmul/convolution, copies/transposes, collectives, infeed/outfeed), and the
top-N individual HLO ops by accumulated duration.

Parsing uses the xplane protobuf bundled with tensorflow
(``tensorflow.tsl.profiler.protobuf.xplane_pb2``) — CPU-only, no TPU needed;
run it on the host after capturing a trace on the device.
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys


def load_xspace(profile_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(profile_dir, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {profile_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs, paths[-1]


# "%lhs = <shape-or-tuple> OPKIND(args…)" — pull the op kind right before the
# opening paren, NOT a substring match (fusions routinely take custom-call
# RESULTS as arguments, which a substring match mis-categorizes).
_OP_KIND = re.compile(r"=\s*(?:\([^)]*\)|\S+)\s+([a-z][a-z0-9-]*)(?:\.\d+)?\(")

_KIND_TO_CAT = {
    "custom-call": "pallas/custom-call",
    "convolution": "matmul/conv",
    "dot": "matmul/conv",
    "copy": "copy/transpose",
    "transpose": "copy/transpose",
    "bitcast": "copy/transpose",
    "copy-start": "copy/transpose",
    "copy-done": "copy/transpose",
    "all-reduce": "collective",
    "all-gather": "collective",
    "reduce-scatter": "collective",
    "collective-permute": "collective",
    "infeed": "infeed/outfeed",
    "outfeed": "infeed/outfeed",
    "scatter": "scatter/gather",
    "gather": "scatter/gather",
    "dynamic-slice": "scatter/gather",
    "dynamic-update-slice": "scatter/gather",
    "reduce": "reduce",
    "fusion": "fusion",
}


def categorize(name: str) -> str:
    # strip layout annotations like {2,1,0:T(8,128)} — they contain parens
    name = re.sub(r"\{[^}]*\}", "", name)
    m = _OP_KIND.search(name)
    if m:
        kind = m.group(1)
        if kind == "fusion":
            # name the fused-computation flavor when the lhs tells us
            # (e.g. %multiply_reduce_fusion.443 = …)
            return "fusion"
        return _KIND_TO_CAT.get(kind, kind)
    # fused computations named like "%foo_fusion.12 = …" with kind in lhs
    if "_fusion" in name or "%fusion" in name:
        return "fusion"
    return "other"


def short(name: str, limit: int = 110) -> str:
    # "%foo = bf16[...]{...} op(args), kind=..." -> keep the lhs + op head
    name = re.sub(r"\{[^}]*\}", "", name)
    return (name[:limit] + "…") if len(name) > limit else name


def main():
    profile_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_profile_step"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    xs, path = load_xspace(profile_dir)
    print(f"trace: {path}")
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        md = plane.event_metadata
        per_op = collections.Counter()
        per_cat = collections.Counter()
        async_ps = 0
        span_lo, span_hi = float("inf"), 0.0
        for line in plane.lines:
            # 'Async XLA Ops' are DMA spans that OVERLAP compute — summing
            # them alongside the sync 'XLA Ops' leaves double-counts time.
            # Report them separately as overlap-bandwidth pressure.
            is_async = "Async" in line.name
            if line.name not in ("XLA Ops", "Async XLA Ops"):
                continue
            for ev in line.events:
                name = md[ev.metadata_id].name
                if is_async:
                    async_ps += ev.duration_ps
                    continue
                if name.startswith("jit_") or name.startswith("%while"):
                    # enclosing program / while wrapper spans everything;
                    # track the wall span but exclude from op sums
                    span_lo = min(span_lo, ev.offset_ps)
                    span_hi = max(span_hi, ev.offset_ps + ev.duration_ps)
                    continue
                per_op[name] += ev.duration_ps
                per_cat[categorize(name)] += ev.duration_ps
        busy = sum(per_op.values())
        print(f"\n== {plane.name} ==")
        if span_hi > span_lo:
            print(f"program span: {(span_hi - span_lo) / 1e9:9.3f} ms")
        print(f"device busy:  {busy / 1e9:9.3f} ms (sync-op sum)")
        print(f"async DMA:    {async_ps / 1e9:9.3f} ms (overlaps compute)")
        print("\n-- category rollup --")
        for cat, ps in per_cat.most_common():
            print(f"  {ps / 1e9:9.3f} ms  {100 * ps / busy:5.1f}%  {cat}")
        print(f"\n-- top {top_n} ops --")
        for name, ps in per_op.most_common(top_n):
            print(f"  {ps / 1e9:9.3f} ms  {short(name)}")


if __name__ == "__main__":
    main()
