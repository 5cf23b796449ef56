"""Weight / gradient histograms and per-layer stats.

Closes the observability gap with NeMAR's TensorBoard visualizer
(``/root/reference/nemar/util/tb_visualizer.py:60-104``: per-epoch
``add_histogram`` over every named parameter and its ``.grad``) without a
TensorBoard dependency: histograms are computed ON DEVICE inside one jitted
call (one scatter-add per leaf, no per-element host traffic), logged as
JSONL, and rendered to a static self-contained HTML page of SVG small
multiples (companion of ``evaluation/gallery.py``).

Usage::

    hists = tree_histograms(state.g_params)           # jitted, device dict
    logger = HistogramLogger("run/hists.jsonl")
    logger.write(step=int(state.step), kind="weights", hists=hists)
    write_histogram_html("run/hists.jsonl", "run/hists.html")

``Trainer.fit(..., hist_logger=..., hist_every=N)`` wires this in, logging
weight histograms every N steps and gradient histograms via a lazily
compiled grads-returning step variant (grads are params-sized; shipping them
host-side every step would dominate the tunnel, so only histogram steps pay).
"""

from __future__ import annotations

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _leaf_histogram(x: jax.Array, bins: int) -> dict:
    """Histogram + summary stats of one tensor, fp32, device-side."""
    v = x.reshape(-1).astype(jnp.float32)
    lo = jnp.min(v)
    hi = jnp.max(v)
    span = jnp.maximum(hi - lo, 1e-12)
    idx = jnp.clip(((v - lo) / span * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.zeros((bins,), jnp.int32).at[idx].add(1)
    return {
        "counts": counts,
        "lo": lo,
        "hi": hi,
        "mean": jnp.mean(v),
        "std": jnp.std(v),
        "l2": jnp.linalg.norm(v),
    }


@partial(jax.jit, static_argnames=("bins",))
def tree_histograms(tree, bins: int = 64):
    """Per-leaf histograms of a pytree (params or grads). Returns a pytree
    of the same structure whose leaves are stat dicts (device arrays)."""
    return jax.tree.map(lambda x: _leaf_histogram(x, bins), tree,
                        is_leaf=lambda x: isinstance(x, jax.Array))


def _flatten(tree, prefix=""):
    """{'G/down1/conv/kernel': stat_dict, ...} from a nested stats tree."""
    out = {}
    if isinstance(tree, dict) and "counts" in tree and "lo" in tree:
        out[prefix.rstrip("/")] = tree
        return out
    items = tree.items() if isinstance(tree, dict) else enumerate(tree)
    for k, v in items:
        out.update(_flatten(v, f"{prefix}{k}/"))
    return out


class HistogramLogger:
    """Appends one JSONL record per (step, kind) with every leaf's histogram."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fh = open(path, "a")

    def write(self, step: int, kind: str, hists) -> None:
        flat = _flatten(hists)
        rec = {"step": step, "kind": kind, "leaves": {}}
        for name, st in flat.items():
            rec["leaves"][name] = {
                "counts": np.asarray(st["counts"]).tolist(),
                "lo": float(np.asarray(st["lo"])),
                "hi": float(np.asarray(st["hi"])),
                "mean": float(np.asarray(st["mean"])),
                "std": float(np.asarray(st["std"])),
                "l2": float(np.asarray(st["l2"])),
            }
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()


# --------------------------------------------------------------------- HTML

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ font-family: sans-serif; background: #111; color: #ddd; }}
 .leaf {{ display: inline-block; margin: 6px; vertical-align: top; }}
 .lab {{ color: #8ac; font-size: 11px; max-width: 240px; overflow: hidden;
         text-overflow: ellipsis; white-space: nowrap; }}
 .meta {{ color: #888; font-size: 10px; }}
 svg {{ background: #181818; }}
 h3 {{ margin: 18px 4px 6px; color: #ccc; }}
</style></head><body>
<h2>{title}</h2>
{sections}
</body></html>
"""


def _svg_hist(counts: list[int], width: int = 240, height: int = 60,
              color: str = "#6ab0f3") -> str:
    n = len(counts)
    peak = max(max(counts), 1)
    bw = width / n
    bars = "".join(
        f'<rect x="{i * bw:.1f}" y="{height * (1 - c / peak):.1f}" '
        f'width="{bw:.1f}" height="{height * c / peak:.1f}" fill="{color}"/>'
        for i, c in enumerate(counts) if c
    )
    return f'<svg width="{width}" height="{height}">{bars}</svg>'


def _svg_series(rows: list[list[int]], width: int = 240, row_h: int = 6,
                color: str = "#6ab0f3", max_rows: int = 16) -> str:
    """Histogram-over-steps heatmap (x = bin, y = step, opacity = count) —
    the static equivalent of TensorBoard's stacked histogram view."""
    rows = rows[-max_rows:]
    n = len(rows[0])
    bw = width / n
    cells = []
    for r, counts in enumerate(rows):
        peak = max(max(counts), 1)
        for i, c in enumerate(counts):
            if c:
                cells.append(
                    f'<rect x="{i * bw:.1f}" y="{r * row_h}" width="{bw:.1f}" '
                    f'height="{row_h}" fill="{color}" '
                    f'opacity="{0.15 + 0.85 * c / peak:.2f}"/>'
                )
    return (f'<svg width="{width}" height="{len(rows) * row_h}">'
            + "".join(cells) + "</svg>")


def write_histogram_html(jsonl_path: str, out_path: str | None = None,
                         title: str | None = None) -> str:
    """Render the JSONL log as one section per kind: the newest histogram per
    leaf plus a step-evolution heatmap when several records exist. Returns
    the written path."""
    history: dict[str, list[dict]] = {}
    with open(jsonl_path) as f:
        for line in f:
            rec = json.loads(line)
            history.setdefault(rec["kind"], []).append(rec)
    sections = []
    for kind in sorted(history):
        recs = sorted(history[kind], key=lambda r: r["step"])
        rec = recs[-1]
        color = "#6ab0f3" if kind == "weights" else "#f3a66a"
        cells = []
        for name, st in rec["leaves"].items():
            series = [r["leaves"][name]["counts"] for r in recs
                      if name in r["leaves"]]
            plot = (_svg_series(series, color=color) if len(series) > 1
                    else _svg_hist(st["counts"], color=color))
            cells.append(
                '<div class="leaf">'
                f'<div class="lab" title="{name}">{name}</div>'
                f'{plot}'
                f'<div class="meta">[{st["lo"]:.3g}, {st["hi"]:.3g}] '
                f'μ {st["mean"]:.3g} σ {st["std"]:.3g} ‖·‖ {st["l2"]:.3g}</div>'
                "</div>"
            )
        sections.append(
            f'<h3>{kind} @ step {rec["step"]} '
            f'({len(recs)} records)</h3>\n' + "\n".join(cells))
    page = _PAGE.format(
        title=title or os.path.basename(jsonl_path), sections="\n".join(sections)
    )
    out_path = out_path or os.path.splitext(jsonl_path)[0] + ".html"
    with open(out_path, "w") as f:
        f.write(page)
    return out_path
