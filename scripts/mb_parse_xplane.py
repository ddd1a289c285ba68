#!/usr/bin/env python
"""Parse a jax.profiler xplane.pb directly (TF-bundled schema) and print
per-HLO-op self times. The tensorboard_plugin_profile converter is broken
against the installed TF (missing xspace_to_tools_data symbol), so this
walks the XSpace proto: for every device plane, self time per event =
duration minus time covered by nested events on the same line.

Usage: python scripts/mb_parse_xplane.py /tmp/rvt_prof_b8 [ncalls] [B]
"""
import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    tdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rvt_prof_b8"
    ncalls = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    top = int(os.environ.get("MB_TOP", "40"))

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True))
    if not paths:
        sys.exit(f"no xplane.pb under {tdir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    selft = defaultdict(float)   # name -> self ns
    count = defaultdict(int)
    cat = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        emeta = plane.event_metadata
        smeta = plane.stat_metadata
        for line in plane.lines:
            if "Module" in line.name:   # whole-program parent events
                continue
            evs = sorted(line.events, key=lambda e: (e.offset_ps,
                                                     -e.duration_ps))
            # stack-based self time: parent loses child durations
            stack = []   # (end_ps, name_idx)
            for e in evs:
                start, dur = e.offset_ps, e.duration_ps
                end = start + dur
                while stack and stack[-1][0] <= start:
                    stack.pop()
                name = emeta[e.metadata_id].name if e.metadata_id in emeta \
                    else f"id{e.metadata_id}"
                for st in e.stats:
                    sm = smeta.get(st.metadata_id)
                    if sm is not None and sm.name == "hlo_category":
                        cat[name] = st.str_value or \
                            smeta[st.value_metadata_id].name
                if stack:
                    selft[stack[-1][1]] -= dur
                selft[name] += dur
                count[name] += 1
                stack.append((end, name))

    tot = sum(selft.values())
    print(f"total self time: {tot/1e9:.2f} ms over {ncalls} calls "
          f"=> {tot/1e9/ncalls:.2f} ms/call, "
          f"{tot/1e9/ncalls/batch:.3f} ms/frame")
    for name, t in sorted(selft.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{t/1e9/ncalls:8.3f} ms/call {100*t/max(tot,1):5.1f}% "
              f"x{count[name]:5d} {cat.get(name, '?'):22s} {name[:110]}")


if __name__ == "__main__":
    main()
