#!/usr/bin/env python
"""TPU compiler-flag sweep on the flagship bench step (VERDICT r2 #8).

Round 2 established that TPU compiler flags pass through
``jax.jit(compiler_options=...)`` even though this stack rejects them in
XLA_FLAGS, and swept only the scoped-VMEM budget (a monotonic loss).
This sweeps the other plausibly-relevant knobs (candidate names
extracted from the local libtpu.so).  Each config is one bench.py
subprocess (fresh compile); results append to the JSONL so a partial
sweep still reports.

    python tools/sweep_compiler_flags.py [--steps 15] [--out /tmp/sweep.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("baseline", ""),
    ("lhs_off", "xla_tpu_enable_latency_hiding_scheduler=false"),
    ("exp_fusion_cost", "xla_tpu_enable_experimental_fusion_cost_model=true"),
    ("aggressive_loop_fusion_layout",
     "xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"),
    ("conv_input_fusion_downcast",
     "xla_tpu_allow_conv_input_fusion_with_downcast_convert=true"),
    ("large_2nd_minor_x16",
     "xla_tpu_enable_large_2nd_minor_layout_for_x16=true,"
     "xla_tpu_allow_large_2nd_minor_layout_for_x16=true"),
    ("vmem_to_vmem_dmas", "xla_tpu_enable_vmem_to_vmem_dmas=true"),
    ("autotune_fusions", "xla_tpu_autotune_fusions=true"),
    ("layout_negotiation", "xla_tpu_allow_layout_negotiation=true"),
    ("all_exp_scheduler",
     "xla_tpu_enable_all_experimental_scheduler_features=true"),
    ("dot_dot_fusion", "xla_tpu_dot_dot_fusion=true"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--out", default="/tmp/flag_sweep.jsonl")
    ap.add_argument("--batch", type=int, default=768)
    args = ap.parse_args()

    for name, copts in CONFIGS:
        env = dict(os.environ, BENCH_COPTS=copts,
                   BENCH_STEPS=str(args.steps),
                   BENCH_BATCH=str(args.batch))
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                capture_output=True, text=True, timeout=1800, env=env,
                cwd=REPO)
            line = p.stdout.strip().split("\n")[-1] if p.stdout else ""
            rec = {"config": name, "copts": copts, "rc": p.returncode}
            try:
                d = json.loads(line)
                rec.update(value=d["value"],
                           step_ms=d["detail"]["step_time_ms"],
                           mfu=d["detail"]["mfu"],
                           batch=d["detail"]["batch"])
            except Exception:
                rec["tail"] = (p.stdout + p.stderr)[-400:]
        except subprocess.TimeoutExpired:
            rec = {"config": name, "copts": copts, "rc": "timeout"}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec)[:200], flush=True)


if __name__ == "__main__":
    main()
