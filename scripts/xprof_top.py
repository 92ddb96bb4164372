#!/usr/bin/env python
"""Rank device ops from an XLA profiler trace (xplane.pb), no TF needed.

`jax.profiler.trace` writes <logdir>/plugins/profile/<run>/*.xplane.pb;
the TensorBoard profile plugin that normally reads it drags in a
TensorFlow proto stack. This is a dependency-free decoder for the small
slice we need: per-op total device time from the TPU op-trace lines.

Usage:
  python scripts/xprof_top.py <logdir-or-xplane.pb> [--top N] [--steps K]

With --steps K, durations are divided by K (per-step figures).
Output: one line per op — us/step, count, occupancy-share, op name.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import struct
import sys


def _varint(buf: bytes, i: int):
    res = 0
    shift = 0
    while True:
        b = buf[i]
        res |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return res, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a serialized message.
    Length-delimited values come back as memoryview slices."""
    i, n = 0, len(buf)
    mv = memoryview(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 1:
            val = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            val = mv[i:i + ln]
            i += ln
        elif wt == 5:
            val = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:  # groups (3/4) unused by xplane
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def _plane_name(plane: bytes) -> str:
    for fnum, wt, val in _fields(plane):
        if fnum == 2 and wt == 2:
            return bytes(val).decode("utf-8", "replace")
    return ""


def parse_plane(plane: bytes):
    """-> (event_names {id: name}, lines [(line_name, [(meta_id, dur_ps)])])"""
    names = {}
    lines = []
    for fnum, wt, val in _fields(plane):
        if fnum == 4 and wt == 2:  # map<int64, XEventMetadata> entry
            key = name = None
            for f2, w2, v2 in _fields(bytes(val)):
                if f2 == 1 and w2 == 0:
                    key = v2
                elif f2 == 2 and w2 == 2:  # XEventMetadata
                    for f3, w3, v3 in _fields(bytes(v2)):
                        if f3 == 1 and w3 == 0 and key is None:
                            key = v3
                        elif f3 == 2 and w3 == 2:
                            name = bytes(v3).decode("utf-8", "replace")
            if key is not None:
                names[key] = name or str(key)
        elif fnum == 3 and wt == 2:  # XLine
            lname = ""
            events = []
            for f2, w2, v2 in _fields(bytes(val)):
                if f2 == 2 and w2 == 2:
                    lname = bytes(v2).decode("utf-8", "replace")
                elif f2 == 4 and w2 == 2:  # XEvent
                    mid = dur = 0
                    for f3, w3, v3 in _fields(bytes(v2)):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 3 and w3 == 0:
                            dur = v3
                    events.append((mid, dur))
            lines.append((lname, events))
    return names, lines


def device_op_totals(path: str, device_substr: str = "TPU"):
    """{op_name: (total_ps, count)} summed over XLA-op lines of device
    planes, plus the busy span (max single-line total) for occupancy."""
    buf = open(path, "rb").read()
    totals = collections.defaultdict(lambda: [0, 0])
    busy_ps = 0
    for fnum, wt, val in _fields(buf):
        if fnum != 1 or wt != 2:
            continue
        plane = bytes(val)
        pname = _plane_name(plane)
        if device_substr not in pname:
            continue
        names, lines = parse_plane(plane)
        for lname, events in lines:
            # the synchronous op-trace lane only: 'Async XLA Ops' events
            # carry overlap-spanning durations, 'XLA Modules'/'Steps'
            # would double-count their children
            if lname != "XLA Ops" or not events:
                continue
            line_total = 0
            for mid, dur in events:
                nm = names.get(mid, str(mid))
                totals[nm][0] += dur
                totals[nm][1] += 1
                line_total += dur
            busy_ps = max(busy_ps, line_total)
    return totals, busy_ps


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        sys.exit(f"no *.xplane.pb under {path}")
    return hits[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--device", default="TPU")
    args = ap.parse_args()

    path = find_xplane(args.path)
    totals, busy_ps = device_op_totals(path, args.device)
    if not totals:
        sys.exit(f"no device planes matching {args.device!r} in {path}")
    grand = sum(t for t, _ in totals.values())
    print(f"# {path}")
    print(f"# device-op total {grand / 1e6 / args.steps:.0f} us/step, "
          f"busiest lane {busy_ps / 1e6 / args.steps:.0f} us/step")
    ranked = sorted(totals.items(), key=lambda kv: -kv[1][0])
    for name, (ps, cnt) in ranked[: args.top]:
        print(f"{ps / 1e6 / args.steps:10.1f} us {cnt / args.steps:7.1f} x "
              f"{100 * ps / grand:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
