#!/usr/bin/env python
"""Per-op attribution of the flagship ResNet-50 train step on the TPU.

Captures a ``jax.profiler`` device trace of the exact bench.py step
(same shapes, same accum schedule), aggregates the device-side op
durations, and joins them against the compiled HLO so every fusion is
labeled with the convolutions/dots it contains.  Output: the top-N ops
by device time — the table VERDICT r2 asked for ("name the top-10 ops
by step time").

    python tools/profile_step.py [--steps 3] [--top 25] [--out PERF]

Works through the axon relay: device events (op name + duration) land
in the trace's /device:TPU:0 track; only wall-clock host times are
relay-polluted, so all analysis below uses device durations only.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def capture(steps: int, trace_dir: str):
    import jax

    import bench

    bench._enable_compile_cache()
    smoke = os.environ.get("BENCH_SMOKE") == "1"
    batch = int(os.environ.get("BENCH_BATCH", 16 if smoke else 768))
    hw = (32, 32) if smoke else (224, 224)
    classes = 10 if smoke else 1000
    step, state, raw, labels, accum = bench.build_step(
        batch, hw, classes, smoke)
    # warm: compile + settle the relay
    for _ in range(2):
        state, loss = step(state, raw, labels)
    float(loss)
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, loss = step(state, raw, labels)
        float(loss)
    # the compiled HLO, for labeling fusions with their conv shapes
    hlo = step.lower(state, raw, labels).compile().as_text()
    return hlo, batch, accum


def load_device_events(trace_dir: str):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [e for e in events if e.get("ph") == "X"
           and "TPU" in str(pid_names.get(e.get("pid"), ""))]
    return dev


_CONV_RE = re.compile(
    r"(%?[\w.\-]+)\s*=\s*(?:\([^)]*\)\s*)?(bf16|f32|u8|s8|s32)"
    r"\[([\d,]+)\][^ ]*\s+(convolution|dot)\(")


def hlo_fusion_labels(hlo: str):
    """fusion name -> human label of the heavy ops it computes."""
    labels = {}
    cur = None
    for line in hlo.split("\n"):
        s = line.strip()
        # fusion computations print as %fused_computation.N or
        # %region_N (scan/cond bodies reusing fusion emission)
        if s.startswith(("%fused_", "fused_", "%region_", "region_")) \
                and "{" in line:
            cur = s.split()[0].lstrip("%").split("(")[0].strip()
        elif s == "}":
            cur = None
        if cur:
            c = _CONV_RE.search(line)
            if c:
                _, dt, shape, kind = c.groups()
                labels.setdefault(cur, []).append(
                    f"{kind} {dt}[{shape}]")
    return labels


def fusion_to_computation(hlo: str):
    """instruction (fusion.N) -> called computation name."""
    out = {}
    for m in re.finditer(
            r"%?([\w.\-]+)\s*=\s*[^=]*fusion\([^)]*\)[^\n]*calls=%?"
            r"([\w.\-]+)", hlo):
        out[m.group(1)] = m.group(2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace_dir", default="/tmp/step_trace")
    ap.add_argument("--hlo_out", default="/tmp/step_hlo.txt")
    ap.add_argument("--parse_only", action="store_true",
                    help="re-analyze an existing trace + saved HLO")
    args = ap.parse_args()

    if args.parse_only:
        hlo = open(args.hlo_out).read()
        batch, accum = "?", "?"
    else:
        hlo, batch, accum = capture(args.steps, args.trace_dir)
        with open(args.hlo_out, "w") as f:
            f.write(hlo)
    dev = load_device_events(args.trace_dir)

    # EXCLUSIVE (self) time: events nest (program > while(scan) >
    # fusion), so raw durations double-count.  Within each thread
    # track, a child is an event fully inside its parent's interval;
    # self = dur - sum(direct children dur).
    agg = collections.defaultdict(lambda: [0, 0.0])
    total = 0.0
    by_track = collections.defaultdict(list)
    for e in dev:
        by_track[(e.get("pid"), e.get("tid"))].append(e)
    for track in by_track.values():
        track.sort(key=lambda e: (float(e.get("ts", 0.0)),
                                  -float(e.get("dur", 0.0))))
        stack = []  # (end_ts, child_sum_accumulator index into rows)
        metas = []
        for e in track:
            ts = float(e.get("ts", 0.0))
            dur = float(e.get("dur", 0.0))
            while stack and ts >= stack[-1][0] - 1e-9:
                stack.pop()
            if stack:
                metas[stack[-1][1]]["child"] += dur
            metas.append({"name": e.get("name", "?"), "dur": dur,
                          "child": 0.0})
            stack.append((ts + dur, len(metas) - 1))
        for m in metas:
            name = m["name"]
            # containers, not ops: the jitted program event and the
            # per-step numbered events on the step track
            if name.startswith("jit_") or name.isdigit():
                continue
            self_t = max(m["dur"] - m["child"], 0.0)
            agg[name][0] += 1
            agg[name][1] += self_t
            total += self_t

    comp_of = fusion_to_computation(hlo)
    labels = hlo_fusion_labels(hlo)

    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    print(f"batch={batch} accum={accum} steps={args.steps} "
          f"device-op total={total/1e3/args.steps:.2f} ms/step")
    print(f"{'op':<40} {'n':>5} {'ms/step':>9} {'%':>6}  heavy ops")
    shown = 0.0
    for name, (n, dur) in rows[:args.top]:
        ms = dur / 1e3 / args.steps
        shown += dur
        comp = comp_of.get(name, name)
        lab = "; ".join(labels.get(comp, [])[:3])
        print(f"{name:<40} {n:>5} {ms:>9.3f} {100*dur/total:>5.1f}%  "
              f"{lab[:80]}")
    print(f"[top {args.top} cover {100*shown/total:.1f}% of device time]")

    # grouped view: attribute each op to its heavy-op label (conv/dot
    # shape) or to a structural kind — the "where does the step go"
    # table
    groups = collections.defaultdict(float)
    for name, (n, dur) in agg.items():
        comp = comp_of.get(name, name)
        labs = labels.get(comp, [])
        convs = [x for x in labs if x.startswith("convolution")]
        if convs:
            key = convs[0]
        elif name.startswith(("select-and-scatter", "reduce-window")):
            key = "pooling fwd/bwd"
        elif "reduce" in name:
            key = "reductions (BN stats/loss/grads)"
        elif any(k in name for k in ("copy", "transpose", "bitcast")):
            key = "copies/transposes"
        elif "dynamic" in name or "slice" in name:
            key = "slicing/dynamic-update"
        else:
            key = "elementwise/other fusions"
        groups[key] += dur
    print("\nby kind / conv shape:")
    for key, dur in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {key:<50} {dur/1e3/args.steps:>9.3f} ms/step "
              f"{100*dur/total:>5.1f}%")


if __name__ == "__main__":
    main()
