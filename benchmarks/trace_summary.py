"""Summarize an xplane.pb trace: top TPU ops by total duration.

Usage: python benchmarks/trace_summary.py /path/to/*.xplane.pb [top_n] [line_filter]

Async DMA spans (copy-start/slice-start and the *-done retirements) include
wait time and overlap compute, so they are reported separately from the
synchronous compute ops.
"""

from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "_xplane"))
import xplane_pb2  # noqa: E402  (compiled from the public xplane schema)

_ASYNC = ("copy-start", "slice-start", "copy-done", "slice-done", "-update")


def _is_async(name: str) -> bool:
    # match only the op-kind region (before the operand list) — operand
    # names routinely contain "copy-done" and previously misclassified
    # big sync ops (pallas custom-calls) as async
    head = name.split("(", 1)[0]
    return any(a in head for a in _ASYNC)


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            by_name = collections.Counter()
            counts = collections.Counter()
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                by_name[name] += ev.duration_ps
                counts[name] += 1
            if not by_name:
                continue
            sync_total = sum(
                ps for n, ps in by_name.items() if not _is_async(n)
            )
            print(
                f"\n== {plane.name} / line '{line.name}': "
                f"{len(line.events)} events, sync-op time {sync_total / 1e9:.2f} ms"
            )
            shown = 0
            for name, ps in by_name.most_common():
                if _is_async(name):
                    continue
                print(f"{ps / 1e9:10.3f} ms  x{counts[name]:<5d} {name[:120]}")
                shown += 1
                if shown >= top_n:
                    break


if __name__ == "__main__":
    main()
