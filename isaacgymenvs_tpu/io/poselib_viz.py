"""Headless skeleton visualization for poselib states and motions.

TPU-native counterpart of the reference's poselib visualization stack
(`tasks/amp/poselib/poselib/visualization/{plt_plotter,
skeleton_plotter_tasks}.py`): that stack drives an interactive
matplotlib 3D window; serving hosts have no display, so this renders
the same primitives (joint dots + parent-child bone segments) straight
to PNG (one state) or GIF (a motion), Agg backend only.

CLI:  python -m isaacgymenvs_tpu.io.poselib_viz motion.npy out.gif
      python -m isaacgymenvs_tpu.io.poselib_viz motion.npy out.png --frame 0
"""

from __future__ import annotations

import numpy as np


def _axes(ax, pts):
    span = float(np.max(pts.max(axis=(0, 1)) - pts.min(axis=(0, 1))))
    span = max(span, 1e-3)
    c = 0.5 * (pts.max(axis=(0, 1)) + pts.min(axis=(0, 1)))
    for set_lim, k in ((ax.set_xlim, 0), (ax.set_ylim, 1),
                      (ax.set_zlim, 2)):
        set_lim(c[k] - 0.6 * span, c[k] + 0.6 * span)
    ax.set_box_aspect((1, 1, 1))


def _draw(ax, xyz, parents):
    ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], s=12, c="#d97757",
               depthshade=False)
    for i, p in enumerate(parents):
        if p < 0:
            continue
        seg = xyz[[p, i]]
        ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], c="#454443", lw=1.5)


def plot_skeleton_state(state, path: str, title: str = ""):
    """Render one SkeletonState (or one frame of a batched state) to a
    PNG. `state.global_translation` may be (nb,3) or (T,nb,3) — frame 0
    is drawn in the latter case."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    xyz = np.asarray(state.global_translation)
    if xyz.ndim == 3:
        xyz = xyz[0]
    parents = np.asarray(state.skeleton_tree.parent_indices)
    fig = plt.figure(figsize=(5, 5), dpi=110)
    ax = fig.add_subplot(projection="3d")
    _draw(ax, xyz, parents)
    _axes(ax, xyz[None])
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def plot_skeleton_motion(motion, path: str, max_frames: int = 120,
                         stride: int | None = None):
    """Render a SkeletonMotion to an animated GIF (PIL frames; no
    display needed). Frames are strided down to `max_frames`."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    xyz = np.asarray(motion.global_translation)       # (T, nb, 3)
    parents = np.asarray(motion.skeleton_tree.parent_indices)
    T = xyz.shape[0]
    if stride is None:
        stride = max(1, -(-T // max_frames))   # ceil: frames ≤ max_frames
    frames = []
    fig = plt.figure(figsize=(5, 5), dpi=90)
    ax = fig.add_subplot(projection="3d")
    for t in range(0, T, stride):
        ax.cla()
        _draw(ax, xyz[t], parents)
        _axes(ax, xyz)
        ax.set_title(f"frame {t}/{T}  ({motion.fps:.0f} fps)")
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())
        frames.append(Image.fromarray(buf[..., :3]))
    plt.close(fig)
    dur = max(20, int(1000 * stride / max(motion.fps, 1)))
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=dur, loop=0)
    return path


def main(argv=None):
    import argparse
    from .poselib import SkeletonMotion

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("motion", help=".npy SkeletonMotion file")
    p.add_argument("out", help="output .gif (motion) or .png (frame)")
    p.add_argument("--frame", type=int, default=None,
                   help="render a single frame as PNG")
    p.add_argument("--max-frames", type=int, default=120)
    a = p.parse_args(argv)
    m = SkeletonMotion.from_file(a.motion)
    if a.frame is not None or a.out.endswith(".png"):
        from .poselib import SkeletonState
        f = a.frame or 0
        st = SkeletonState(m.skeleton_tree, m.rotation[f],
                           m.root_translation[f])
        plot_skeleton_state(st, a.out, title=f"frame {f}")
    else:
        plot_skeleton_motion(m, a.out, max_frames=a.max_frames)
    print(a.out)


if __name__ == "__main__":
    main()
