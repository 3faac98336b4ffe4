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


def device_time(fn, args, tag, iters=12):
    """Total device-op ms/iter of ``jit(fn)(*args)`` from a profiler
    trace — relay-immune (host clocks on this transport cannot resolve
    kernel time; PERF_NOTES round 5 §1).  The one shared implementation
    for the A/B tools (ab_pallas_conv_pair, ab_layout_nchw)."""
    import jax

    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    tdir = f"/tmp/ab_trace_{tag}"
    with jax.profiler.trace(tdir):
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
    agg = collections.defaultdict(float)
    for e in load_device_events(tdir):
        nm = e.get("name", "?")
        if nm.startswith("jit_") or nm.isdigit():
            continue
        agg[nm] += float(e.get("dur", 0.0))
    return sum(agg.values()) / 1e3 / iters


_CONV_RE = re.compile(
    r"(%?[\w.\-]+)\s*=\s*(?:\([^)]*\)\s*)?(bf16|f32|u8|s8|s32)"
    r"\[([\d,]+)\][^ ]*\s+(convolution|dot)\(")

_SHAPE_RE = re.compile(
    r"%?([\w.\-]+)\s*=\s*(?:\([^)]*\)\s*)?(bf16|f32|f64|u8|s8|s32|u32|pred)"
    r"\[([\d,]*)\]")


def _prod(dims):
    out = 1
    for d in dims:
        out *= d
    return out


def _window_fields(line):
    """Parse window={size=.. stride=.. pad=.. lhs_dilate=.. rhs_dilate=..}
    into per-dim int lists (defaults: stride 1, pad 0_0, dilation 1)."""
    w = re.search(r"window=\{([^}]*)\}", line)
    fields = {}
    if w:
        for part in w.group(1).split():
            k, _, v = part.partition("=")
            fields[k] = v
    size = [int(x) for x in fields.get("size", "").split("x") if x]
    nd = len(size)

    def ints(key, default):
        vals = [int(x) for x in fields.get(key, "").split("x") if x]
        return vals if len(vals) == nd else [default] * nd

    stride = ints("stride", 1)
    pad_raw = [x for x in fields.get("pad", "").split("x") if x]
    pads = ([tuple(int(p) for p in x.split("_")) for x in pad_raw]
            if len(pad_raw) == nd else [(0, 0)] * nd)
    ld = ints("lhs_dilate", 1)
    rd = ints("rhs_dilate", 1)
    return size, stride, pads, ld, rd


def _valid_tap_fraction(line, lhs, out, lspec, ospec):
    """Fraction of (output, window-tap) pairs that read a real input
    element — i.e. land inside the lhs-dilated input AND on a non-zero
    lhs_dilation slot.  Multiplying the naive conv FLOP count by this
    reproduces XLA cost analysis's valid-position counting (exact for
    fwd convs with SAME padding, stride-s dgrads, and wgrads alike)."""
    size, stride, pads, ld, rd = _window_fields(line)
    frac = 1.0
    for j in range(len(size)):
        dj = str(j)
        if dj not in lspec or dj not in ospec:
            return 1.0
        I = lhs[lspec.index(dj)]
        O = out[ospec.index(dj)]
        W, st, (plo, _), l, r = size[j], stride[j], pads[j], ld[j], rd[j]
        span = (I - 1) * l + 1
        valid = 0
        for k in range(W):
            base = k * r - plo
            # outputs o with 0 <= o*st + base < span and (o*st+base)%l==0
            for o in range(O):
                pos = o * st + base
                if 0 <= pos < span and pos % l == 0:
                    valid += 1
        if O * W:
            frac *= valid / (O * W)
    return frac


def hlo_conv_flops(hlo: str):
    """instruction-name -> FLOPs of its convolution/dot (one execution),
    and computation-name -> summed FLOPs of the conv/dots it contains.

    Conv FLOPs = 2 * prod(out_shape) * prod(rhs_shape) / rhs_out_feature
    (the reduction per output element is the rhs minus its output-feature
    axis — holds for fwd, dgrad and wgrad-as-conv alike, and for grouped
    convs, since grouping shrinks the rhs 'i' axis).  rhs_out_feature is
    read off ``dim_labels``'s rhs spec ('o' position).  Dots use the rhs
    contracting dims.  Matches XLA cost analysis's naive counting
    (dilation zeros included), which is what MFU accounting wants.
    """
    # instruction shapes, SCOPED by enclosing computation — fusion
    # parameter names (%param_0.1) repeat in every fusion body, so a
    # flat name->shape map resolves operands to arbitrary shapes
    shapes = {}
    dtypes = {}
    inst_flops, comp_flops = {}, collections.defaultdict(float)
    inst_bytes, comp_bytes = {}, collections.defaultdict(float)
    _DT_BYTES = {"bf16": 2, "f32": 4, "f64": 8, "u8": 1, "s8": 1,
                 "s32": 4, "u32": 4, "pred": 1}
    cur = None
    lines = hlo.split("\n")
    for line in lines:
        s = line.strip()
        if s.endswith("{") and ("(" in s) and ("->" in s or
                                               s.startswith("ENTRY")):
            cur = s.split()[0].lstrip("%")
            if cur == "ENTRY":
                cur = s.split()[1].lstrip("%")
            cur = cur.split("(")[0]
        elif s == "}":
            cur = None
            continue
        m = _SHAPE_RE.match(s[5:] if s.startswith("ROOT ") else s)
        if m:
            name, dt, dims = m.groups()
            shapes[(cur, name)] = ([int(d) for d in dims.split(",")]
                                   if dims else [])
            dtypes[(cur, name)] = dt
        c = _CONV_RE.search(line)
        if not c:
            continue
        name, _, out_dims, kind = c.groups()
        name = name.lstrip("%")
        out = [int(d) for d in out_dims.split(",")]
        args = re.search(r"(?:convolution|dot)\(([^)]*)\)", line)
        if not args:
            continue
        ops = [a.strip().lstrip("%") for a in args.group(1).split(",")]
        ops = [a.split()[-1].lstrip("%") for a in ops if a]
        if len(ops) < 2:
            continue
        rhs = shapes.get((cur, ops[1]))
        if rhs is None:
            continue
        fl = 0.0
        if kind == "convolution":
            dl = re.search(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)",
                           line)
            lhs = shapes.get((cur, ops[0]))
            if dl and lhs is not None:
                lspec, rspec, ospec = dl.groups()
                o_pos = rspec.index("o") if "o" in rspec else -1
                cout = rhs[o_pos] if 0 <= o_pos < len(rhs) else 1
                fl = 2.0 * _prod(out) * _prod(rhs) / max(cout, 1)
                # XLA's cost analysis bills only VALID window taps —
                # positions landing inside the (dilated) input, on a
                # real element.  The naive count above bills padding
                # and dilation zeros too, which for transposed-conv
                # derivatives (huge symmetric pads, lhs_dilate) is
                # orders of magnitude off.  Correct per spatial dim.
                fl *= _valid_tap_fraction(line, lhs, out, lspec, ospec)
        else:  # dot
            cd = re.search(r"rhs_contracting_dims=\{([\d,]*)\}", line)
            if cd and cd.group(1):
                k = _prod(rhs[int(i)] for i in cd.group(1).split(","))
                fl = 2.0 * _prod(out) * k
        if fl:
            inst_flops[name] = inst_flops.get(name, 0.0) + fl
            if cur:
                comp_flops[cur] += fl
            # minimum HBM traffic of this conv: operands read once +
            # output written once (ignores the fusion's extra BN-param
            # operands, which are KBs)
            lhs_sh = shapes.get((cur, ops[0]), [])
            by = sum(_prod(sh) * _DT_BYTES.get(dtypes.get((cur, nm),
                                                          "f32"), 4)
                     for nm, sh in ((ops[0], lhs_sh), (ops[1], rhs),
                                    (name, out)))
            inst_bytes[name] = inst_bytes.get(name, 0.0) + by
            if cur:
                comp_bytes[cur] += by
    return inst_flops, dict(comp_flops), inst_bytes, dict(comp_bytes)


_INSTR_LINE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*?)\s([a-z][\w\-]*)\((.*)$")
_ANY_SHAPE_RE = re.compile(
    r"\b(bf16|f16|f32|f64|u8|s8|u16|s16|u32|s32|u64|s64|pred)"
    r"\[([\d,]*)\]")
_LAYOUT_SHAPE_RE = re.compile(
    r"\b(?:bf16|f16|f32|f64|u8|s8|u16|s16|u32|s32|u64|s64|pred)"
    r"\[[\d,]*\](?:\{[^}]*\})?")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')
_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "f64": 8, "u8": 1, "s8": 1,
          "u16": 2, "s16": 2, "u32": 4, "s32": 4, "u64": 8, "s64": 8,
          "pred": 1}


def _shapes_bytes(text: str) -> float:
    return sum(_prod(int(d) for d in dims.split(",") if d)
               * _BYTES.get(dt, 4)
               for dt, dims in _ANY_SHAPE_RE.findall(text))


_OPERAND_NAME_RE = re.compile(r"%([\w.\-]+)")


def parse_hlo_instructions(hlo: str):
    """Global instruction map: name -> {opcode, comp, out_bytes,
    operand_bytes, out_txt, operand_txt, op_name}; plus a per-
    computation opcode histogram for labeling fusion bodies.

    Traffic model per instruction = operands read once + outputs
    written once (sum over tuple elements).  Operand shapes are
    RESOLVED by name through a per-computation shape map — compiled
    HLO prints operands as bare ``%name`` references — falling back to
    inline shapes when printed.  Async ``*-done`` ops count 2x their
    output (the transferred buffer read+written) rather than their
    start-tuple operand, which holds the full source.  This model is
    an UPPER bound on HBM traffic per op: fusion operands pinned in
    scoped VMEM (backend_config scoped_memory_configs) never sweep
    HBM, so achieved-GB/s above the chip's measured bandwidth flags
    VMEM reuse, not a timing artifact.  Decomposes the VERDICT-r4
    opaque buckets (elementwise 37.5 ms / copies 17.4 ms) per-op.
    """
    comp_shapes = collections.defaultdict(dict)  # comp -> name -> bytes
    comp_ops = collections.defaultdict(collections.Counter)
    pending = []  # (name, info, comp, [operand names])
    instrs = {}
    cur = None
    for raw in hlo.split("\n"):
        st = raw.strip()
        if st.endswith("{") and "(" in st and ("->" in st
                                               or st.startswith("ENTRY")):
            cur = st.split()[0].lstrip("%")
            if cur == "ENTRY":
                cur = st.split()[1].lstrip("%")
            cur = cur.split("(")[0]
            continue
        if st == "}":
            cur = None
            continue
        m = _INSTR_LINE_RE.match(raw)
        if not m:
            continue
        name, out_txt, opcode, rest = m.groups()
        # operand region: scan to the matching close paren
        depth, end = 1, len(rest)
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        operand_txt, tail = rest[:end], rest[end:]
        out_bytes = _shapes_bytes(out_txt)
        comp_shapes[cur][name] = out_bytes
        if opcode != "parameter" and cur:
            comp_ops[cur][opcode] += 1
        if opcode in ("parameter", "constant"):
            continue
        onm = _OPNAME_RE.search(tail)
        info = {
            "opcode": opcode, "comp": cur, "out_bytes": out_bytes,
            "operand_bytes": 0.0,
            "out_txt": out_txt, "operand_txt": operand_txt,
            "op_name": onm.group(1) if onm else "",
        }
        prev = instrs.get(name)
        # names repeat only for fusion-body locals; prefer entry/region
        if prev is None or (prev["opcode"] != opcode
                            and opcode == "fusion"):
            instrs[name] = info
            pending.append((info, cur,
                            _OPERAND_NAME_RE.findall(operand_txt)))
    flat = {}
    for shp in comp_shapes.values():
        for n, b in shp.items():
            flat.setdefault(n, b)
    for info, comp, ops in pending:
        if info["opcode"].endswith("-done"):
            # async copy/slice completion: the transfer moved the
            # OUTPUT buffer (read src + write dst); the start-tuple
            # operand also holds the full source — don't bill it
            info["operand_bytes"] = info["out_bytes"]
            continue
        local = comp_shapes.get(comp, {})
        resolved = sum(local.get(o, flat.get(o, 0.0)) for o in ops)
        inline = _shapes_bytes(info["operand_txt"])
        info["operand_bytes"] = max(resolved, inline)
    return instrs, comp_ops


def _hist_label(counter, top=5):
    drop = {"bitcast", "get-tuple-element", "tuple", "broadcast",
            "reshape", "constant"}
    items = [(k, v) for k, v in counter.most_common() if k not in drop]
    return ",".join(f"{k}x{v}" for k, v in items[:top])


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
    ap.add_argument("--detail", type=int, default=12,
                    help="per-op rows to print for each non-conv bucket "
                         "(0 disables the decomposition)")
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
    # table.  Alongside device time, sum the FLOPs each group executes
    # per step (HLO-derived, naive counting like XLA cost analysis) so
    # every group gets an achieved-TF/s column — the per-shape MFU
    # reconciliation VERDICT r3 asked for.
    inst_flops, comp_flops, inst_bytes, comp_bytes = hlo_conv_flops(hlo)
    instrs, comp_ops = parse_hlo_instructions(hlo)
    # dur_us, flops/step, conv-operand bytes/step, full traffic bytes/step
    groups = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0.0])
    members = collections.defaultdict(list)  # group -> [(dur, name, n)]
    for name, (n, dur) in agg.items():
        comp = comp_of.get(name, name)
        labs = labels.get(comp, [])
        convs = [x for x in labs if x.startswith("convolution")]
        fl = comp_flops.get(comp, 0.0) or inst_flops.get(name, 0.0)
        by = comp_bytes.get(comp, 0.0) or inst_bytes.get(name, 0.0)
        info = instrs.get(name)
        traffic = (info["out_bytes"] + info["operand_bytes"]) if info \
            else 0.0
        if convs:
            key = convs[0]
        elif fl:
            key = "dots/other matmul fusions"
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
        groups[key][0] += dur
        groups[key][1] += fl * n / args.steps  # flops per step
        groups[key][2] += by * n / args.steps  # conv-operand bytes/step
        groups[key][3] += traffic * n / args.steps  # full traffic
        members[key].append((dur, name, n))
    # Per-group roofline: the time this group's convs CANNOT beat on
    # this chip = max(flops / peak_bf16, conv-operand bytes / HBM GB/s)
    # — the checkable per-shape ceiling VERDICT r3 item 1 asked for.
    peak = float(os.environ.get("PROFILE_PEAK_TFS", "197")) * 1e12
    # 680 GB/s = device-trace-measured sustained HBM (tools/
    # measure_bw.py, round 5); the old 411 default was the dispatch-
    # chain probe's relay-latency artifact
    bw = float(os.environ.get("PROFILE_HBM_GBPS", "680")) * 1e9
    print(f"\nby kind / conv shape (achieved TF/s; roofline ms = "
          f"max(flops/{peak/1e12:.0f}TF/s, bytes/{bw/1e9:.0f}GB/s)):")
    tot_fl = tot_roof = tot_nonconv_ms = tot_traf_roof = 0.0
    for key, (dur, fl, by, traf) in sorted(groups.items(),
                                           key=lambda kv: -kv[1][0]):
        ms = dur / 1e3 / args.steps
        if fl:
            tfs = f"{fl / (ms / 1e3) / 1e12:>6.1f}"
            roof_ms = max(fl / peak, by / bw) * 1e3
            bound = "bw" if by / bw > fl / peak else "mxu"
            roof = f"{roof_ms:>7.2f} ({bound})"
            tot_roof += roof_ms
        else:
            tfs, roof = "     -", "      -"
            tot_nonconv_ms += ms
            # non-conv groups get a TRAFFIC roofline: the bytes the
            # group's ops provably sweep / measured HBM bandwidth —
            # completes the bound VERDICT r4 asked for (every bucket
            # attributed, none opaque)
            if traf:
                roof_ms = traf / bw * 1e3
                gbs = traf / (ms / 1e3) / 1e9
                roof = f"{roof_ms:>7.2f} (bw, {gbs:>5.0f} GB/s ach.)"
                tot_traf_roof += roof_ms
        tot_fl += fl
        print(f"  {key:<46} {ms:>8.3f} ms {100*dur/total:>5.1f}%  "
              f"{tfs} TF/s  roofline {roof}")
    step_ms = total / 1e3 / args.steps
    floor_ms = tot_roof + tot_nonconv_ms
    print(f"  [HLO-summed flops/step = {tot_fl/1e12:.2f} TF; "
          f"aggregate {tot_fl/(total/1e6/args.steps)/1e12:.1f} TF/s "
          f"over device-op time]")
    print(f"  [conv roofline sum {tot_roof:.1f} ms + measured non-conv "
          f"{tot_nonconv_ms:.1f} ms = {floor_ms:.1f} ms floor vs "
          f"{step_ms:.1f} ms measured -> ceiling MFU "
          f"{tot_fl/(floor_ms/1e3)/peak:.3f} at this mix, achieved "
          f"{tot_fl/(step_ms/1e3)/peak:.3f}]")
    bound_ms = tot_roof + tot_traf_roof
    if bound_ms > 0:
        print(f"  [complete bound: conv rooflines {tot_roof:.1f} ms + "
              f"non-conv traffic rooflines {tot_traf_roof:.1f} ms = "
              f"{bound_ms:.1f} ms -> every-bucket-attributed ceiling "
              f"MFU {tot_fl/(bound_ms/1e3)/peak:.3f}]")
    else:
        # no conv/dot groups and no attributable traffic (e.g. an HLO
        # dump format parse_hlo_instructions can't resolve): say so
        # instead of dividing by zero before --detail prints
        print("  [complete bound: no attributable rooflines in this "
              "trace/HLO — bound unavailable]")

    if args.detail:
        _print_detail(args, members, instrs, comp_of, comp_ops, agg, bw)


_DETAIL_GROUPS = ("elementwise/other fusions", "copies/transposes",
                  "slicing/dynamic-update", "pooling fwd/bwd",
                  "reductions (BN stats/loss/grads)",
                  "dots/other matmul fusions")


def _print_detail(args, members, instrs, comp_of, comp_ops, agg, bw):
    """Per-op decomposition of the non-conv buckets: every op >= the
    cutoff gets its name, device ms/step, traffic bytes, achieved GB/s,
    traffic-roofline ms, a body label (op-kind histogram for fusions;
    src->dst layouts for copies/transposes) and the JAX op_name that
    produced it (HLO metadata) — the attribution VERDICT r4 item 1
    demanded."""
    for key in _DETAIL_GROUPS:
        rows = sorted(members.get(key, ()), reverse=True)
        if not rows:
            continue
        print(f"\n[{key}] per-op (top {args.detail}):")
        for dur, name, n in rows[:args.detail]:
            ms = dur / 1e3 / args.steps
            info = instrs.get(name)
            if info is None:
                print(f"  {name:<44} {n:>4}x {ms:>8.3f} ms  "
                      f"(no HLO instr match)")
                continue
            traf = (info["out_bytes"] + info["operand_bytes"]) \
                * n / args.steps
            gbs = traf / (ms / 1e3) / 1e9 if ms else 0.0
            roof_ms = traf / bw * 1e3
            if info["opcode"] == "fusion":
                comp = comp_of.get(name, "")
                lab = _hist_label(comp_ops.get(comp, collections.Counter()))
            elif info["opcode"] in ("copy", "transpose", "bitcast",
                                    "bitcast-convert"):
                src = _LAYOUT_SHAPE_RE.findall(info["operand_txt"])
                lab = (f"{src[0] if src else '?'} -> "
                       f"{info['out_txt']}")
            else:
                lab = info["opcode"]
            print(f"  {name:<44} {n:>4}x {ms:>8.3f} ms  "
                  f"{traf/1e6:>8.1f} MB/step {gbs:>5.0f} GB/s "
                  f"roof {roof_ms:>6.2f} ms  {lab[:70]}")
            if info["op_name"]:
                print(f"    src: {info['op_name'][:110]}")


if __name__ == "__main__":
    main()
