"""Parse a jax.profiler trace dir (*.xplane.pb) and print per-op device
time, aggregated by op name prefix. Usage:

  python tools/parse_xplane.py /tmp/jax_trace_prefill [top_n]
"""

from __future__ import annotations

import collections
import glob
import gzip
import os
import sys


def load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_op_times(xs, plane_filter=("TPU", "/device")):
    """{op_name: total_us} from device planes' XLA-op lines."""
    agg = collections.Counter()
    total_span = 0.0
    for plane in xs.planes:
        if not any(s in plane.name for s in plane_filter):
            continue
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; step lines would double
            # count.
            if "xla op" not in lname and "xla ops" not in lname:
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                agg[name] += ev.duration_ps / 1e6  # ps -> us
    return agg


def bucket(name: str) -> str:
    """Collapse %fusion.123 -> fusion, custom-call targets kept."""
    n = name.lstrip("%")
    base = n.split(".")[0]
    return base


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    xs = load_xspace(trace_dir)
    agg = device_op_times(xs)
    if not agg:
        # fall back: list plane/line names to debug
        for plane in xs.planes:
            print("plane:", plane.name,
                  [ln.name for ln in plane.lines][:8])
        return
    total = sum(agg.values())
    print(f"total device op time: {total/1e3:.2f} ms over {len(agg)} ops")
    by_bucket = collections.Counter()
    for k, v in agg.items():
        by_bucket[bucket(k)] += v
    print("\n-- by op class --")
    for k, v in by_bucket.most_common(top_n):
        print(f"{v/1e3:9.2f} ms  {100*v/total:5.1f}%  {k}")
    print("\n-- top individual ops --")
    for k, v in agg.most_common(top_n):
        print(f"{v/1e3:9.2f} ms  {100*v/total:5.1f}%  {k[:110]}")


if __name__ == "__main__":
    main()
