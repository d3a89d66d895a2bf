"""Post-processing & cross-experiment reporting utilities.

Equivalents of the reference's ``plotting/`` toolbox (SURVEY §2.1 C13-C16):

  * ``cost_curve_overlay``  — ``plotting/plotting.py``: overlay several
    runs' ``J_array.npy`` cost curves with labels,
  * ``aggregate_timings``   — ``plotting/timing_calculations.py``: parse a
    ``timings.txt`` (same format) into average outer/inner times and totals,
  * ``timing_histogram``    — ``plotting/histogram_plotting.py``: log-scale
    bar chart of seconds-per-iteration vs buoy count (the published
    baseline figure; the reference's measured CPU values are retained as
    the comparison series),
  * ``replot_field``        — ``plotting/replot.py``: re-render a saved
    velocity checkpoint (ours or a dolfin .h5).
"""

from __future__ import annotations

import re
from typing import Dict, Sequence, Tuple

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# the reference's published CPU baseline (histogram_plotting.py:9-10)
REFERENCE_BUOY_COUNTS = [10, 100, 400, 10000]
REFERENCE_ITERATION_TIMES = [0.10, 11.98, 77.82, 1500.0]


def cost_curve_overlay(runs: Dict[str, str], path: str,
                       title: str = r"Reduced cost $j(q)$") -> None:
    """runs: {label: path_to_J_array.npy}  (plotting/plotting.py:10-44)."""
    plt.figure()
    plt.xlabel("Iteration")
    plt.ylabel("Cost")
    plt.title(title)
    for label, jpath in runs.items():
        j = np.load(jpath)
        plt.plot(j, label=label)
    plt.legend(loc="best")
    plt.savefig(path, bbox_inches="tight")
    plt.close()


def aggregate_timings(timings_path: str) -> Dict[str, float]:
    """Parse ``timings.txt`` (format of OCP_dolfin.py:476-482) and return
    the aggregates computed by ``plotting/timing_calculations.py:4-33``."""
    outer, inner, iters = [], [], []
    with open(timings_path) as fh:
        for line in fh:
            m = re.search(r"outer loop time: ([0-9.eE+-]+)", line)
            if m:
                outer.append(float(m.group(1)))
            m = re.search(r"inner loop time: ([0-9.eE+-]+)", line)
            if m:
                inner.append(float(m.group(1)))
            m = re.search(r"inner loop iterations: (\d+)", line)
            if m:
                iters.append(int(m.group(1)))
    outer_a, inner_a = np.asarray(outer), np.asarray(inner)
    return {
        "iterations": len(outer),
        "avg_outer_time": float(outer_a.mean()) if len(outer) else 0.0,
        "avg_inner_time": float(inner_a.mean()) if len(inner) else 0.0,
        "total_outer_time": float(outer_a.sum()),
        "total_inner_time": float(inner_a.sum()),
        "total_time": float(outer_a.sum() + inner_a.sum()),
        "total_inner_iterations": int(np.sum(iters)) if iters else 0,
    }


def timing_histogram(path: str,
                     buoy_counts: Sequence[int] = None,
                     iteration_times: Sequence[float] = None,
                     compare_reference: bool = True) -> None:
    """Log-scale bar chart of avg GD-iteration time vs buoy count
    (histogram_plotting.py). Pass our measured numbers; the reference CPU
    baseline is drawn alongside for the speedup story."""
    plt.figure()
    counts = list(buoy_counts or REFERENCE_BUOY_COUNTS)
    xs = np.arange(len(counts), dtype=float)
    width = 0.38
    if compare_reference:
        plt.bar(xs - width / 2, REFERENCE_ITERATION_TIMES[:len(counts)],
                width, label="reference (FEniCS, CPU)", color="gray")
        if iteration_times is not None:
            plt.bar(xs + width / 2, iteration_times, width,
                    label="ocean_jax (TPU)", color="tab:blue")
    else:
        plt.bar(xs, iteration_times, width * 2, color="tab:blue")
    plt.yscale("log")
    plt.xticks(xs, [str(c) for c in counts])
    plt.xlabel("number of buoys")
    plt.ylabel("avg time per GD iteration [s]")
    plt.legend(loc="best")
    plt.savefig(path, bbox_inches="tight")
    plt.close()


def replot_field(checkpoint_path: str, out_path: str, nx: int = 32,
                 extent: Tuple[float, float] = (2.0, 2.0),
                 name: str = "u") -> None:
    """Re-render a saved velocity field (ours ``.npz`` or dolfin ``.h5``) —
    the working version of the reference's broken ``plotting/replot.py``."""
    from .mesh import rectangle_mesh
    from .fem import make_space
    from .io import plots
    mesh = rectangle_mesh((0.0, 0.0), extent, nx, nx)
    if checkpoint_path.endswith(".h5"):
        from .io.dolfin_h5 import read_checkpoint_velocity
        space = make_space(mesh)
        u = read_checkpoint_velocity(checkpoint_path, mesh, space, name)
    else:
        with np.load(checkpoint_path) as data:
            u = data["u"]
    plots.plot_velocity_field(mesh, np.asarray(u[: mesh.num_vertices]),
                              out_path)
