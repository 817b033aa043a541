"""Tree/plan visualization (reference C12: matplotlib scatter of nodes, edge
segments, highlighted plan, projected on two chosen state dims).

Host-side only: operates on device_get snapshots, never inside jit.
"""
from __future__ import annotations

import numpy as np


def visualize_planner(planner, dx: int = 0, dy: int = 1, ax=None,
                      show: bool = True, max_edges: int = 4000):
    import matplotlib
    if show is False and matplotlib.get_backend().lower() != "agg":
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(9, 6))
    tree = planner._device_tree
    if tree is not None:
        import jax
        host = jax.device_get(tree)
        size = int(host.size)
        states = host.state[:size]
        ax.scatter(states[:, dx], states[:, dy], s=2, c="#8899aa", zorder=2)
        # edge polylines (downsample if huge)
        step = max(size // max_edges, 1)
        for i in range(1, size, step):
            ln = int(host.edge_len[i])
            if ln > 0:
                seg = host.edge_x[i][:ln]
                p = host.state[int(host.parent[i])]
                xs = np.concatenate([[p[dx]], seg[:, dx]])
                ys = np.concatenate([[p[dy]], seg[:, dy]])
                ax.plot(xs, ys, lw=0.3, c="#bbccdd", zorder=1)
    if planner.x_seq is not None and len(planner.x_seq) > 1:
        ax.plot(planner.x_seq[:, dx], planner.x_seq[:, dy], lw=2.0,
                c="#cc3333", zorder=3, label="plan")
    if planner.goal is not None:
        g = np.asarray(planner.goal)
        ax.plot(g[dx], g[dy], "*", ms=14, c="#33aa33", zorder=4, label="goal")
    ax.set_xlabel(f"state[{dx}]")
    ax.set_ylabel(f"state[{dy}]")
    ax.legend(loc="best")
    ax.set_aspect("equal", adjustable="datalim")
    if show:
        plt.show()
    return ax
