"""Minimal xplane.pb parser: aggregate HLO-op durations per name from a JAX
profiler trace, no tensorflow/tensorboard needed (their protobuf bindings
clash with the installed protobuf).

Wire-level decode of XSpace (tsl/profiler/protos/xplane.proto):
  XSpace.planes=1; XPlane{id=1,name=2,lines=3,event_metadata=4(map)};
  XLine{id=1,name=2,events=4}; XEvent{metadata_id=1,offset_ps=2,duration_ps=3};
  XEventMetadata{id=1,name=2}.

Usage: python scripts/xplane_ops.py <trace.xplane.pb> [topN]
"""
import struct
import sys
from collections import defaultdict


def varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f'wire type {wt}')
        yield fno, wt, v


def parse_event(buf):
    mid = dur = 0
    for fno, wt, v in fields(buf):
        if fno == 1:
            mid = v
        elif fno == 3:
            dur = v
    return mid, dur


def parse_line(buf):
    name = ''
    events = []
    for fno, wt, v in fields(buf):
        if fno == 2:
            name = v.decode('utf-8', 'replace')
        elif fno == 4:
            events.append(parse_event(v))
    return name, events


def parse_meta_entry(buf):
    """map<int64, XEventMetadata> entry: key=1, value=2."""
    k = 0
    name = ''
    for fno, wt, v in fields(buf):
        if fno == 1:
            k = v
        elif fno == 2:
            for f2, w2, v2 in fields(v):
                if f2 == 2:
                    name = v2.decode('utf-8', 'replace')
    return k, name


def parse_plane(buf):
    name = ''
    lines = []
    meta = {}
    for fno, wt, v in fields(buf):
        if fno == 2:
            name = v.decode('utf-8', 'replace')
        elif fno == 3:
            lines.append(parse_line(v))
        elif fno == 4:
            k, nm = parse_meta_entry(v)
            meta[k] = nm
    return name, lines, meta


def summarize(path, topn=40, line_filter=('XLA Ops',), plane_filter='TPU'):
    data = open(path, 'rb').read()
    agg = defaultdict(lambda: [0, 0])  # name -> [dur_ps, count]
    total = 0
    for fno, wt, v in fields(data):
        if fno != 1:
            continue
        pname, lines, meta = parse_plane(v)
        if plane_filter not in pname:
            continue
        for lname, events in lines:
            if line_filter and lname not in line_filter:
                continue
            for mid, dur in events:
                nm = meta.get(mid, f'#{mid}')
                agg[nm][0] += dur
                agg[nm][1] += 1
                total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f'plane filter={plane_filter!r} line={line_filter} '
          f'total={total / 1e9:.3f} ms  ops={len(rows)}')
    for nm, (dur, cnt) in rows[:topn]:
        print(f'  {100 * dur / max(total, 1):5.1f}%  {dur / 1e9:9.3f} ms  '
              f'x{cnt:<6d} {nm[:110]}')
    return rows, total


if __name__ == '__main__':
    path = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    # list planes/lines first
    data = open(path, 'rb').read()
    for fno, wt, v in fields(data):
        if fno == 1:
            pname, lines, meta = parse_plane(v)
            print(f'plane: {pname!r} lines={[l[0] for l in lines]}')
    summarize(path, topn)
