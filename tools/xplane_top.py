"""Offline xplane trace analysis: top device ops by self time.

Parses the ``*.xplane.pb`` written by jax.profiler.trace (via the
installed xprof/tensorboard_plugin_profile protos — no TensorBoard
server needed) and prints per-op totals for the TPU device planes,
grouped by HLO op name with fusion/custom-call annotations kept.

Usage: python tools/xplane_top.py <logdir-or-xplane.pb> [top_n]
"""
from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    if os.path.isdir(path):
        cands = glob.glob(os.path.join(
            path, "**", "*.xplane.pb"), recursive=True)
        if not cands:
            raise SystemExit(f"no *.xplane.pb under {path}")
        path = max(cands, key=os.path.getmtime)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        totals = defaultdict(float)   # name -> total us
        counts = defaultdict(int)
        plane_total = 0.0
        for line in plane.lines:
            # XLA op lines carry per-op events; step lines etc. are
            # skipped by only counting lines named like XLA ops
            lname = line.name.lower()
            if "xla op" in lname or "xla modules" in lname:
                pass
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                dur = ev.duration_ps / 1e6   # ps -> us
                if "xla op" in lname:
                    totals[md.name] += dur
                    counts[md.name] += 1
                    plane_total += dur
        if not totals:
            continue
        print(f"\n== {plane.name}  (sum of XLA-op self time "
              f"{plane_total/1e3:.2f} ms over the traced window) ==")
        rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]
        for name, us in rows:
            print(f"{us:10.0f} us  {us/plane_total*100:5.1f}%  "
                  f"x{counts[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
