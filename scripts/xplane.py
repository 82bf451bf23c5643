"""Minimal XLA profiler-trace (xplane.pb) parser and op-time aggregator.

``jax.profiler.trace`` writes `XSpace` protos
(`plugins/profile/<ts>/<host>.xplane.pb`), but reading them normally needs
`tensorboard_plugin_profile`, which is not installed here. This decodes the
protobuf wire format directly against a hand-written schema of the XPlane
messages (tensorflow/tsl/profiler/protobuf/xplane.proto) — ~100 lines, no
codegen, no extra deps.

Replaces the reference's `scripts/run_profiler.py` torch.profiler harness
role (reference `scripts/run_profiler.py:12-51`) for the "where did the
step time go" question.

Usage:
    python scripts/xplane.py [trace.xplane.pb] [--plane SUBSTR] [--top N]
                             [--no-merge]   # keep fusion.NNN ids separate

With no path, picks the newest ``/tmp/jax_trace/**/*.xplane.pb``.
Prints per-plane (device) op-time aggregation grouped by event name.
"""

from __future__ import annotations

import glob
import os
import struct
import sys
from collections import defaultdict


# ---------------------------------------------------------------- wire format
def _varint(buf: memoryview, i: int):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over one message buffer."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, i = _varint(buf, i)
        elif wt == 1:  # 64-bit
            v = struct.unpack_from("<Q", buf, i)[0]
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            v = struct.unpack_from("<I", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, v


def _map_entry(buf: memoryview):
    k = v = None
    for fnum, _, val in fields(buf):
        if fnum == 1:
            k = val
        elif fnum == 2:
            v = val
    return k, v


# ------------------------------------------------------------------- messages
def parse_event(buf):  # XEvent
    ev = {"metadata_id": 0, "duration_ps": 0, "offset_ps": 0, "occurrences": 1}
    for fnum, _, v in fields(buf):
        if fnum == 1:
            ev["metadata_id"] = v
        elif fnum == 2:
            ev["offset_ps"] = v
        elif fnum == 3:
            ev["duration_ps"] = v
        elif fnum == 5:
            ev["occurrences"] = v
    return ev


def parse_line(buf):  # XLine
    line = {"name": "", "events": []}
    for fnum, _, v in fields(buf):
        if fnum == 2:
            line["name"] = bytes(v).decode("utf-8", "replace")
        elif fnum == 11:
            line["display_name"] = bytes(v).decode("utf-8", "replace")
        elif fnum == 4:
            line["events"].append(parse_event(v))
    return line


def parse_event_metadata(buf):  # XEventMetadata
    md = {"name": ""}
    for fnum, _, v in fields(buf):
        if fnum == 2:
            md["name"] = bytes(v).decode("utf-8", "replace")
        elif fnum == 4:
            md["display_name"] = bytes(v).decode("utf-8", "replace")
    return md


def parse_plane(buf):  # XPlane
    plane = {"name": "", "lines": [], "event_metadata": {}}
    for fnum, _, v in fields(buf):
        if fnum == 2:
            plane["name"] = bytes(v).decode("utf-8", "replace")
        elif fnum == 3:
            plane["lines"].append(parse_line(v))
        elif fnum == 4:
            k, mv = _map_entry(v)
            if mv is not None:
                plane["event_metadata"][k] = parse_event_metadata(mv)
    return plane


def parse_space(data: bytes):  # XSpace
    return [parse_plane(v) for fnum, _, v in fields(memoryview(data)) if fnum == 1]


# ------------------------------------------------------------------ reporting
def aggregate(plane, merge_fusion_ids=True):
    """Sum event durations by op name across the plane's lines."""
    agg = defaultdict(lambda: [0.0, 0])  # name -> [ps, count]
    md = plane["event_metadata"]
    for line in plane["lines"]:
        for ev in line["events"]:
            m = md.get(ev["metadata_id"], {})
            name = m.get("display_name") or m.get("name") or str(ev["metadata_id"])
            if merge_fusion_ids:
                # fusion.123 / fusion.45 -> fusion.* buckets by op kind
                base = name.split(".")[0]
                name = base if base else name
            a = agg[name]
            a[0] += ev["duration_ps"]
            a[1] += max(1, ev.get("occurrences", 1))
    return agg


def main(argv):
    path = None
    plane_filter = None
    top = 30
    merge = True
    args = list(argv)
    while args:
        a = args.pop(0)
        if a == "--plane":
            plane_filter = args.pop(0)
        elif a == "--top":
            top = int(args.pop(0))
        elif a == "--no-merge":
            merge = False
        else:
            path = a
    if path is None or os.path.isdir(path):
        root = path or "/tmp/jax_trace"
        cands = sorted(
            glob.glob(f"{root}/**/*.xplane.pb", recursive=True),
            key=os.path.getmtime,
        )
        if not cands:
            print(f"no trace found under {root}", file=sys.stderr)
            return 1
        path = cands[-1]
    print(f"# {path}")
    with open(path, "rb") as f:
        planes = parse_space(f.read())
    for plane in planes:
        if plane_filter and plane_filter not in plane["name"]:
            continue
        agg = aggregate(plane, merge_fusion_ids=merge)
        total_ps = sum(v[0] for v in agg.values())
        if not total_ps:
            continue
        n_lines = len(plane["lines"])
        print(f"\n== plane: {plane['name']}  ({n_lines} lines, "
              f"{total_ps / 1e9:.3f} ms total)")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
        for name, (ps, cnt) in rows:
            print(f"  {ps / 1e9:9.3f} ms  {cnt:6d}x  {ps / total_ps * 100:5.1f}%  {name[:90]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
