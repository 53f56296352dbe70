"""Offline trajectory re-renderer — the headless analogue of the
reference's interactive viewer (`tasks/base/vec_task.py:225-252,408-440`).

TPU hosts have no rasterizer; training parity never needs graphics. The
eval player dumps env 0's generalized coordinates (`runner.play(...,
capture_trajectory=True)` → `<logdir>/trajectory.npz`), and this module
turns the dump into a stick-figure animation (GIF via matplotlib) or a
grid of PNG keyframes:

    python -m isaacgymenvs_tpu.utils.viewer runs/Ant/trajectory.npz \
        --task Ant --out runs/Ant/trajectory.gif
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _fk_positions(task: str, qs: np.ndarray) -> tuple:
    """FK over the frame sequence → (T, nb, 3) world body positions and
    the parent index array for drawing the skeleton segments."""
    import jax
    import jax.numpy as jnp

    import isaacgymenvs_tpu

    env = isaacgymenvs_tpu.make(task=task, num_envs=1)
    model = env.model
    from ..physics.kinematics import forward_kinematics

    params = model.default_phys_params()
    qd = jnp.zeros(model.nv)

    @jax.jit
    def fk(q):
        return forward_kinematics(model, params, q, qd).body_pos

    pos = np.stack([np.asarray(fk(jnp.asarray(q))) for q in qs])
    return pos, np.asarray(model.body_parent), model


def render_trajectory(npz_path: str, task: str, out: str = "",
                      fps: int = 30, stride: int = 2,
                      keyframes: int = 0) -> str:
    """Render a trajectory dump to a GIF (default) or, with keyframes>0,
    a single PNG strip of evenly spaced poses."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.load(npz_path, allow_pickle=True)
    qs = data["q"][::stride]
    pos, parent, model = _fk_positions(task, qs)
    out = out or os.path.splitext(npz_path)[0] + (
        ".png" if keyframes else ".gif")

    # camera TRACKS the robot: span from the body's own extent (one
    # frame), center follows the root — a humanoid sprinting 100 m
    # would otherwise shrink to a dot inside whole-trajectory axes
    ext = pos - pos[:, :1]
    span = max(2.4 * float(np.abs(ext).max()), 0.5)

    def draw(ax, p):
        for b in range(1, len(parent)):
            pa = parent[b]
            if pa < 0:
                continue
            seg = np.stack([p[pa], p[b]])
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], "-o",
                    color="tab:blue", ms=2, lw=1.5)
        ax.scatter(*p[0], color="tab:red", s=30)  # root
        mid = p[0]
        for i, axis in enumerate("xyz"):
            getattr(ax, f"set_{axis}lim")(mid[i] - span / 2,
                                          mid[i] + span / 2)
        ax.set_box_aspect((1, 1, 1))

    if keyframes:
        idx = np.linspace(0, len(pos) - 1, keyframes).astype(int)
        fig = plt.figure(figsize=(3 * keyframes, 3))
        for j, i in enumerate(idx):
            ax = fig.add_subplot(1, keyframes, j + 1, projection="3d")
            draw(ax, pos[i])
            ax.set_title(f"t={i * stride}", fontsize=8)
        fig.savefig(out, dpi=90, bbox_inches="tight")
        plt.close(fig)
        return out

    from matplotlib.animation import FuncAnimation, PillowWriter

    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")

    def update(i):
        ax.cla()
        draw(ax, pos[i])
        ax.set_title(f"{task}  frame {i * stride}", fontsize=9)

    anim = FuncAnimation(fig, update, frames=len(pos))
    anim.save(out, writer=PillowWriter(fps=fps))
    plt.close(fig)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("npz", help="trajectory.npz from runner.play")
    ap.add_argument("--task", required=True)
    ap.add_argument("--out", default="")
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--keyframes", type=int, default=0,
                    help="render a PNG strip of N poses instead of a GIF")
    a = ap.parse_args(argv)
    out = render_trajectory(a.npz, a.task, a.out, a.fps, a.stride,
                            a.keyframes)
    print(f"rendered {out}")


if __name__ == "__main__":
    main()
