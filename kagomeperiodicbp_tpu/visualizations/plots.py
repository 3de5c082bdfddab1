"""Plotting: lattice/TN structure and ITE convergence dashboards.

(reference: /root/reference/src/visualizations/ite.py:280 `ITEPlots` live
dashboards and src/tensor_networks/visualizations.py — here matplotlib is
imported lazily and everything degrades to no-ops when unavailable/headless.)
"""
from __future__ import annotations

import math
from typing import Optional


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_block(N: int, ax=None, with_messages: bool = True, save: Optional[str] = None):
    """Draw the size-N Kagome block (nodes, edges, boundary legs)."""
    plt = _plt()
    from ..lattices import BlockSide, KagomeBlock

    block = KagomeBlock.build(N)
    if ax is None:
        _, ax = plt.subplots(figsize=(7, 7))
    pos = block.positions
    for v in range(block.n_nodes):
        for leg in range(4):
            n = block.neighbors[v, leg]
            if n >= 0 and n > v:
                ax.plot([pos[v, 0], pos[n, 0]], [pos[v, 1], pos[n, 1]], "b-", lw=0.8)
            elif n < 0 and with_messages:
                d = block.node_dirs(v)[leg]
                ax.plot(
                    [pos[v, 0], pos[v, 0] + 0.8 * d.unit[0]],
                    [pos[v, 1], pos[v, 1] + 0.8 * d.unit[1]],
                    "g--", lw=0.6,
                )
    colors = ["tab:red", "tab:green", "tab:blue"]
    for k in range(3):
        sel = block.kinds == k
        ax.scatter(pos[sel, 0], pos[sel, 1], c=colors[k], s=30, label="ABC"[k], zorder=3)
    ax.legend()
    ax.set_aspect("equal")
    ax.set_title(f"Kagome block N={N} ({block.n_nodes} nodes)")
    if save:
        plt.savefig(save, dpi=120, bbox_inches="tight")
    return ax


def plot_tracker(tracker, reference_energy: Optional[float] = None, save: Optional[str] = None):
    """Energy-vs-segment convergence plot from an ITETracker."""
    plt = _plt()
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    ax1.plot(tracker.energies, ".-", label="energy/site")
    if reference_energy is not None:
        ax1.axhline(reference_energy, color="k", ls=":", label="reference")
    ax1.set_xlabel("segment")
    ax1.set_ylabel("energy/site")
    ax1.legend()
    if reference_energy is not None:
        err = [e - reference_energy for e in tracker.energies]
        ax2.semilogy([abs(e) for e in err], ".-")
        ax2.set_xlabel("segment")
        ax2.set_ylabel("|E − E_ref|")
    ax2b = ax2.twinx()
    ax2b.semilogy(tracker.delta_ts, "r--", alpha=0.5)
    ax2b.set_ylabel("δt", color="r")
    if save:
        fig.savefig(save, dpi=120, bbox_inches="tight")
    return fig


class ITEPlots:
    """Live convergence dashboard updated per segment
    (reference: visualizations/ite.py:280). Writes PNGs (headless-safe)."""

    def __init__(self, active: bool = True, out_path: str = "logs/ite_progress.png",
                 reference_energy: Optional[float] = None):
        self.active = active
        self.out_path = out_path
        self.reference_energy = reference_energy

    def update(self, tracker) -> None:
        if not self.active or not tracker.energies:
            return
        try:
            import os

            os.makedirs(os.path.dirname(os.path.abspath(self.out_path)), exist_ok=True)
            fig = plot_tracker(tracker, self.reference_energy, save=self.out_path)
            _plt().close(fig)
        except Exception:
            self.active = False  # headless/broken matplotlib → stop trying
