"""Matplotlib figure set — mirrors the reference's plots (SURVEY §5.5).

Figures (reference locations):
  * mesh with Γ₁/Γ₂ colored boundary (``OCP_dolfin.py:454-472``),
  * per-iteration flow fields (``:432-437``),
  * cost curve J (``:513-521``),
  * buoy-trajectory overlays vs x_d (``:531-552``),
  * per-buoy velocity vs u_d time series (``:554-567``),
  * final velocity field (``:569-575``).

Matplotlib is used with the Agg backend; figures are a byproduct, not the
compute path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..mesh.structured import Mesh2D  # noqa: E402


def _mesh_boundary_lines(l_shape: bool):
    """The hand-drawn boundary segments (``OCP_dolfin.py:85-103``)."""
    if l_shape:
        return ([[[0.0, 2.0], [0.0, 0.0]], [[0.0, 0.0], [0.0, 1.0]],
                 [[0.0, 1.0], [1.0, 1.0]], [[1.0, 1.0], [1.0, 2.0]],
                 [[1.0, 2.0], [2.0, 2.0]], [[2.0, 2.0], [2.0, 0.0]]],
                [1, 4], [0, 2, 3, 5])   # Γ₁ segment ids, Γ₂ segment ids
    return ([[[0.0, 2.0], [0.0, 0.0]], [[0.0, 0.0], [0.0, 2.0]],
             [[0.0, 2.0], [2.0, 2.0]], [[2.0, 2.0], [2.0, 0.0]]],
            [1, 3], [0, 2])


def plot_mesh(mesh: Mesh2D, path: str, l_shape: bool = False) -> None:
    plt.figure()
    plt.title(r"discretized domain $\Omega_h$")
    plt.xlabel(r"$x$")
    plt.ylabel(r"$y$")
    plt.triplot(mesh.vertices[:, 0], mesh.vertices[:, 1], mesh.cells,
                lw=0.3, color="tab:blue")
    lines, g1, g2 = _mesh_boundary_lines(l_shape)
    for i, line in enumerate(lines):
        color = "orange" if i in g1 else "blue"
        label = (r"$\Gamma_1$" if i == g1[0]
                 else (r"$\Gamma_2$" if i == g2[0] else None))
        plt.plot(line[0], line[1], color=color, label=label)
    plt.legend(loc="best", bbox_to_anchor=(1.02, 1))
    plt.savefig(path, bbox_inches="tight")
    plt.close()


def plot_velocity_field(mesh: Mesh2D, u_vertex: np.ndarray, path: str,
                        title: str = r"Velocity field $u$") -> None:
    """Quiver colored by magnitude, like dolfin's matplotlib vector plot
    (``OCP_dolfin.py:434,570``). u_vertex: (nv, 2) values at vertices."""
    plt.figure()
    mag = np.linalg.norm(u_vertex, axis=1)
    q = plt.quiver(mesh.vertices[:, 0], mesh.vertices[:, 1],
                   u_vertex[:, 0], u_vertex[:, 1], mag)
    plt.colorbar(q)
    plt.title(title)
    plt.xlabel(r"$x$")
    plt.ylabel(r"$y$")
    plt.savefig(path, bbox_inches="tight")
    plt.close()


def plot_cost(j_array: Sequence[float], path: str) -> None:
    plt.figure()
    plt.xlabel(r"Iteration")
    plt.ylabel(r"Cost")
    plt.title(r"Reduced cost $j(q)$")
    plt.plot(np.asarray(j_array), color="black")
    plt.savefig(path, bbox_inches="tight")
    plt.close()


def _dotted(k: int):
    base = k + 1
    return (0, (base, base // 2))


def plot_buoy_movement(x: np.ndarray, x_d: Optional[np.ndarray],
                       seeds: np.ndarray, path: str,
                       l_shape: bool = False) -> None:
    """Trajectory overlay (``OCP_dolfin.py:531-552``). x: (K, nt, 2);
    x_d: (K, nt, 2) desired trajectories or None."""
    plt.figure()
    plt.xlabel(r"$x$")
    plt.ylabel(r"$y$")
    plt.title(r"Buoy movement result")
    K = x.shape[0]
    ax = plt.gca()
    ax.set_aspect("equal", adjustable="box")
    for i in range(min(K, 30)):       # cap labels for large ensembles
        plt.scatter(seeds[i, 0], seeds[i, 1], color="red", zorder=5)
        if K <= 10:
            plt.text(seeds[i, 0], seeds[i, 1] + 0.1, rf"$x_{i+1}(0)$",
                     ha="center", va="center")
        if x_d is not None:
            plt.plot(x_d[i, :, 0], x_d[i, :, 1],
                     label=r"$x_d$" if i == 0 else "", color="black",
                     alpha=0.5)
        plt.plot(x[i, :, 0], x[i, :, 1], label=rf"$x_{i+1}$" if K <= 10
                 else None, color="b", linestyle=_dotted(i + 1))
    lines, _, _ = _mesh_boundary_lines(l_shape)
    for line in lines:
        plt.plot(line[0], line[1], color="gray")
    if K <= 10:
        plt.legend(loc="best", bbox_to_anchor=(1.02, 1))
    plt.savefig(path, bbox_inches="tight")
    plt.close()


def plot_velocity_comparison(time_interval: np.ndarray, u_d: np.ndarray,
                             u_values: np.ndarray, k: int,
                             path: str) -> None:
    """Per-buoy velocity vs u_d time series (``OCP_dolfin.py:554-567``)."""
    plt.figure()
    plt.title(rf"Velocity comparison for buoy k={k + 1}")
    plt.xlabel("Time")
    plt.ylabel("Velocity")
    ls = _dotted(k + 1)
    plt.plot(time_interval, u_d[k, :, 0], label=r"$u_{d,1}$",
             color="black", alpha=0.8)
    plt.plot(time_interval, u_d[k, :, 1], label=r"$u_{d,2}$",
             color="black", alpha=0.8)
    plt.plot(time_interval, u_values[k, :, 0], label=r"$u_{1}$",
             linestyle=ls, color="b")
    plt.plot(time_interval, u_values[k, :, 1], label=r"$u_{2}$",
             linestyle=ls, color="b")
    plt.legend(loc="best")
    plt.savefig(path, bbox_inches="tight")
    plt.close()
