"""Learning-curve plots from the trainer's JSONL metric stream
(SURVEY.md §5: the reference saves loss/metric curves [LOW]; the rebuild
renders them from the structured log so plots are reproducible
post-hoc)."""

from __future__ import annotations

import json
import os
from collections import defaultdict


def read_metrics(jsonl_path: str) -> dict[str, list[tuple[int, float]]]:
    series: dict[str, list[tuple[int, float]]] = defaultdict(list)
    with open(jsonl_path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            step = rec.get("step")
            for k, v in rec.items():
                if k in ("step", "time") or not isinstance(v, (int, float)):
                    continue
                series[k].append((int(step), float(v)))
    return dict(series)


def plot_curves(jsonl_path: str, out_path: str | None = None,
                keys: list[str] | None = None) -> str:
    """Render selected metric series to a PNG next to the log."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series = read_metrics(jsonl_path)
    keys = keys or [k for k in series if k != "images_per_sec"]
    keys = [k for k in keys if k in series]
    if not keys:
        raise ValueError(f"no plottable series in {jsonl_path!r}")
    fig, axes = plt.subplots(len(keys), 1, figsize=(7, 2.4 * len(keys)),
                             sharex=True, squeeze=False)
    for ax, key in zip(axes[:, 0], keys):
        steps, vals = zip(*series[key])
        ax.plot(steps, vals, lw=1.2)
        ax.set_ylabel(key)
        ax.grid(True, alpha=0.3)
    axes[-1, 0].set_xlabel("step")
    fig.tight_layout()
    out_path = out_path or os.path.splitext(jsonl_path)[0] + "_curves.png"
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
