"""Aggregate device time per op from a jax.profiler trace directory.

Usage:  python tools/trace_ops.py /tmp/xprof [top_n] [--window t0,t1]

Finds the newest ``*.trace.json.gz`` under the directory, keeps events on
device-side "XLA Ops" threads (the only truthful timeline through the
axon tunnel — host walls hide device time, NEXT.md gotchas), and prints
total ms / call count / mean µs per op name, plus a coarse grouping
(fusion, dynamic-slice/update, custom-call = Pallas, convert/copy, etc.)
so a decode-step time budget can be read off directly.
"""
import collections
import glob
import gzip
import json
import os
import sys


def load_events(profile_dir: str):
    paths = glob.glob(os.path.join(profile_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {profile_dir}")
    path = max(paths, key=os.path.getmtime)
    print(f"# {path}", file=sys.stderr)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # pid/tid -> names from metadata events
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    return events, pid_names, tid_names


def main():
    profile_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 and not \
        sys.argv[2].startswith("--") else 30
    window = None
    if "--window" in sys.argv:
        t0, t1 = sys.argv[sys.argv.index("--window") + 1].split(",")
        window = (float(t0), float(t1))

    events, pid_names, tid_names = load_events(profile_dir)
    op_threads = {k for k, v in tid_names.items() if "XLA Ops" in v}
    if not op_threads:
        print("# no 'XLA Ops' thread; threads seen:", file=sys.stderr)
        for k, v in sorted(tid_names.items()):
            print(f"#   {pid_names.get(k[0], k[0])} / {v}", file=sys.stderr)
        raise SystemExit(1)

    per_op = collections.defaultdict(lambda: [0.0, 0])
    t_min, t_max = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or (e["pid"], e["tid"]) not in op_threads:
            continue
        ts, dur = e.get("ts", 0.0), e.get("dur", 0.0)
        if window and not (window[0] <= ts / 1e6 <= window[1]):
            continue
        per_op[e["name"]][0] += dur
        per_op[e["name"]][1] += 1
        t_min = min(t_min, ts)
        t_max = max(t_max, ts + dur)

    total_us = sum(v[0] for v in per_op.values())
    span_us = max(t_max - t_min, 1.0)
    print(f"# device busy {total_us/1e3:.1f} ms over a {span_us/1e3:.1f} ms "
          f"span ({100*total_us/span_us:.1f}% occupancy)")

    def group_of(name: str) -> str:
        n = name.lower()
        for key, g in (("custom-call", "pallas/custom-call"),
                       ("fusion", "fusion"),
                       ("dynamic-update-slice", "dyn-update-slice"),
                       ("dynamic-slice", "dyn-slice"),
                       ("convert", "convert"), ("copy", "copy"),
                       ("all-reduce", "collective"),
                       ("all-gather", "collective"),
                       ("reduce-scatter", "collective"),
                       ("convolution", "conv"), ("dot", "dot"),
                       ("scatter", "scatter"), ("gather", "gather"),
                       ("transpose", "transpose"), ("reduce", "reduce"),
                       ("select", "elementwise"), ("add", "elementwise"),
                       ("multiply", "elementwise"),
                       ("iota", "elementwise"), ("broadcast", "elementwise"),
                       ("bitcast", "copy"), ("reshape", "copy"),
                       ("slice", "slice"), ("tuple", "misc")):
            if key in n:
                return g
        return "misc"

    groups = collections.defaultdict(lambda: [0.0, 0])
    for name, (us, cnt) in per_op.items():
        g = group_of(name)
        groups[g][0] += us
        groups[g][1] += cnt
    print("\n## By group")
    for g, (us, cnt) in sorted(groups.items(), key=lambda kv: -kv[1][0]):
        print(f"{us/1e3:10.2f} ms  {100*us/total_us:5.1f}%  {cnt:7d}x  {g}")

    print(f"\n## Top {top_n} ops")
    for name, (us, cnt) in sorted(per_op.items(),
                                  key=lambda kv: -kv[1][0])[:top_n]:
        print(f"{us/1e3:10.2f} ms  {100*us/total_us:5.1f}%  {cnt:7d}x  "
              f"{us/max(cnt,1):8.1f} us/call  {name[:110]}")


if __name__ == "__main__":
    main()
