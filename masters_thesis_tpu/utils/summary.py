"""Model summary text — the reference snapshots model.summary() into the
run dir as modelsummary.txt (Callbacks/EpochLoss.py:12-52). Here: a
parameter-tree table with shapes, counts and bytes."""

from __future__ import annotations

import jax
import numpy as np


def model_summary(params, batch_stats=None, name: str = "model") -> str:
    rows = []

    def collect(tree, kind):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in flat:
            p = "/".join(
                getattr(k, "key", getattr(k, "name", str(k))) for k in path
            )
            arr = np.asarray(leaf)
            rows.append((p, kind, tuple(arr.shape), arr.size,
                         arr.size * arr.dtype.itemsize, str(arr.dtype)))

    collect(params, "param")
    if batch_stats:
        collect(batch_stats, "stat")

    width = max((len(r[0]) for r in rows), default=10) + 2
    lines = [f"Model: {name}", "=" * (width + 44),
             f"{'name':<{width}}{'kind':<7}{'shape':<20}{'params':>12}"]
    lines.append("-" * (width + 44))
    total = trainable = 0
    for p, kind, shape, size, nbytes, dtype in rows:
        lines.append(f"{p:<{width}}{kind:<7}{str(shape):<20}{size:>12,}")
        total += size
        if kind == "param":
            trainable += size
    lines.append("=" * (width + 44))
    lines.append(f"Total params: {total:,} "
                 f"({sum(r[4] for r in rows) / 1e6:.1f} MB)")
    lines.append(f"Trainable params: {trainable:,}")
    lines.append(f"Non-trainable (batch stats): {total - trainable:,}")
    return "\n".join(lines) + "\n"
