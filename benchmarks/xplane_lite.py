"""Minimal XPlane protobuf reader — no tensorflow proto dependency.

The image's TF 2.21 dropped ``tensorflow.core.profiler.protobuf``, but
``jax.profiler.trace`` still writes ``*.xplane.pb`` with real TPU device
planes (HLO op events). This module parses just enough of the protobuf
wire format (varint + length-delimited) to aggregate per-op device time.

Schema subset (tsl/profiler/protobuf/xplane.proto):
  XSpace.planes = 1 (msg XPlane)
  XPlane.name = 2 (str), .lines = 3 (msg XLine),
         .event_metadata = 4 (map<int64, XEventMetadata>)
  XLine.name = 2, .display_name = 11, .events = 4 (msg XEvent)
  XEvent.metadata_id = 1, .duration_ps = 3
  XEventMetadata.id = 1, .name = 2, .display_name = 4
  map entries: {key = 1, value = 2}
"""
from __future__ import annotations


def _varint(buf, i):
    v, shift = 0, 0
    while True:
        b = buf[i]
        v |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return v, i
        shift += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over one message's wire bytes."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_xplane_ops(path):
    """-> list of (plane_name, {op_name: (total_ps, count)})."""
    data = open(path, "rb").read()
    out = []
    for fno, _, plane_buf in fields(data):
        if fno != 1:
            continue
        name, lines, meta = "", [], {}
        for pf, _, pv in fields(plane_buf):
            if pf == 2:
                name = pv.decode("utf-8", "replace")
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:                      # map entry
                mid, mname = None, ""
                for ef, _, ev in fields(pv):
                    if ef == 1:
                        mid = ev
                    elif ef == 2:              # XEventMetadata
                        disp = ""
                        for mf, _, mv in fields(ev):
                            if mf == 2:
                                mname = mv.decode("utf-8", "replace")
                            elif mf == 4:
                                disp = mv.decode("utf-8", "replace")
                        mname = disp or mname
                if mid is not None:
                    meta[mid] = mname
        totals: dict = {}
        for line_buf in lines:
            for lf, _, lv in fields(line_buf):
                if lf != 4:
                    continue
                mid, dur = None, 0
                for ef, wt, ev in fields(lv):
                    if ef == 1 and wt == 0:
                        mid = ev
                    elif ef == 3 and wt == 0:
                        dur = ev
                op = meta.get(mid, str(mid))
                t, c = totals.get(op, (0, 0))
                totals[op] = (t + dur, c + 1)
        out.append((name, totals))
    return out
