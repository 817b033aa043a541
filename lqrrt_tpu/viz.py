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
                seg = host.edge_x[:ln, :, i]     # time-major (H, n, N)
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


def animate_planner(planner, dx: int = 0, dy: int = 1, path: str = None,
                    x_hist=None, fps: int = 20, growth_frames: int = 30,
                    max_edges: int = 2000, dpi: int = 80):
    """Animated tree growth + vehicle trace (reference C12: the demos'
    matplotlib animation of tree + plan).

    Phase 1 replays the tree's growth in commit order (nodes are stored in
    the order rounds committed them, so prefix-sweeping the SoA arrays IS
    the growth replay — no snapshots needed).  Phase 2 drives a vehicle
    marker along ``x_hist`` (a tracked trajectory, e.g. from a sim loop) or
    the committed plan.  Saves a GIF when ``path`` ends with .gif (Pillow
    writer, no ffmpeg dependency); returns the FuncAnimation.
    """
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    import jax

    tree = planner._device_tree
    if tree is None:
        raise RuntimeError("no tree; call update_plan first")
    host = jax.device_get(tree)
    size = int(host.size)
    plan = planner.x_seq
    trace = np.asarray(x_hist if x_hist is not None else plan)

    fig, ax = plt.subplots(figsize=(9, 6))
    if planner.goal is not None:
        g = np.asarray(planner.goal)
        ax.plot(g[dx], g[dy], "*", ms=14, c="#33aa33", zorder=5)
    # precompute downsampled edge polylines in commit order
    step = max(size // max_edges, 1)
    edge_ids = list(range(1, size, step))
    lines = []
    for i in edge_ids:
        ln = int(host.edge_len[i])
        p = host.state[int(host.parent[i])]
        seg = host.edge_x[:ln, :, i] if ln > 0 else host.state[i][None]
        xs = np.concatenate([[p[dx]], seg[:, dx]])
        ys = np.concatenate([[p[dy]], seg[:, dy]])
        (line,) = ax.plot(xs, ys, lw=0.3, c="#bbccdd", zorder=1,
                          visible=False)
        lines.append(line)
    if plan is not None and len(plan) > 1:
        (plan_line,) = ax.plot(plan[:, dx], plan[:, dy], lw=2.0, c="#cc3333",
                               zorder=3, visible=False)
    else:
        plan_line = None
    (veh,) = ax.plot([], [], "o", ms=8, c="#2244cc", zorder=6)
    ax.set_xlabel(f"state[{dx}]")
    ax.set_ylabel(f"state[{dy}]")
    ax.set_aspect("equal", adjustable="datalim")
    ax.relim(); ax.autoscale_view()

    trace_stride = max(len(trace) // (4 * growth_frames), 1)
    trace_frames = len(range(0, len(trace), trace_stride))
    n_frames = growth_frames + trace_frames

    def update(f):
        if f < growth_frames:               # phase 1: tree growth replay
            upto = int((f + 1) / growth_frames * len(lines))
            for line in lines[:upto]:
                line.set_visible(True)
            return lines[:upto]
        if plan_line is not None:
            plan_line.set_visible(True)
        k = min((f - growth_frames) * trace_stride, len(trace) - 1)
        veh.set_data([trace[k, dx]], [trace[k, dy]])
        return [veh]

    anim = FuncAnimation(fig, update, frames=n_frames, blit=False,
                         interval=1000 / fps)
    if path is not None:
        anim.save(path, writer=PillowWriter(fps=fps), dpi=dpi)
        plt.close(fig)
    return anim
