"""Pose visualization: 2D keypoints + 3D reconstructions → mp4/gif.

Capability parity with the reference ``common/visualization.py:58-183``
(``render_animation``, ``read_video``): an input panel with the 2D
keypoints over video (or black background) next to one 3D subplot per
named pose sequence, written with ffmpeg (mp4) or pillow (gif).
Host-side, optional dependency on matplotlib/ffmpeg — not on any hot path.
"""

from __future__ import annotations

import subprocess as sp
from typing import Dict, Optional, Tuple

import numpy as np


def downsample_tensor(x: np.ndarray, factor: int) -> np.ndarray:
    length = x.shape[0] // factor * factor
    return np.mean(x[:length].reshape(-1, factor, *x.shape[1:]), axis=1)


def read_video(filename: str, fps: Optional[float] = None, skip: int = 0):
    """Yield RGB frames from a video via an ffmpeg rawvideo pipe."""
    w, h = _get_resolution(filename)
    cmd = ["ffmpeg", "-i", filename, "-f", "image2pipe", "-pix_fmt", "rgb24",
           "-vsync", "0", "-vcodec", "rawvideo", "-"]
    pipe = sp.Popen(cmd, stdout=sp.PIPE, stderr=sp.DEVNULL, bufsize=-1)
    i = 0
    while True:
        data = pipe.stdout.read(w * h * 3)
        if not data:
            break
        i += 1
        if i > skip:
            yield np.frombuffer(data, dtype="uint8").reshape(h, w, 3)
    pipe.stdout.close()


def _get_resolution(filename: str) -> Tuple[int, int]:
    cmd = ["ffprobe", "-v", "error", "-select_streams", "v:0",
           "-show_entries", "stream=width,height", "-of", "csv=p=0", filename]
    out = sp.check_output(cmd).decode().strip().split(",")
    return int(out[0]), int(out[1])


def render_animation(
    keypoints: np.ndarray,
    poses: Dict[str, np.ndarray],
    skeleton,
    fps: int,
    bitrate: int,
    azim: float,
    output: str,
    viewport: Tuple[int, int],
    limit: int = -1,
    downsample: int = 1,
    size: int = 6,
    input_video_path: Optional[str] = None,
    input_video_skip: int = 0,
):
    """Animate 2D inputs + 3D pose panels and save to mp4/gif.

    ``keypoints``: [F, J, 2] screen coords; ``poses``: {title: [F, J, 3]};
    ``skeleton``: a :class:`diffpose_tpu.skeleton.Skeleton`.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, writers

    if limit < 1:
        limit = keypoints.shape[0]
    limit = min(limit, keypoints.shape[0], *[p.shape[0] for p in poses.values()])
    if downsample > 1:
        keypoints = downsample_tensor(keypoints, downsample)
        poses = {k: downsample_tensor(v, downsample) for k, v in poses.items()}
        limit = limit // downsample
        fps = max(fps // downsample, 1)

    if input_video_path is None:
        frames = np.zeros((limit, viewport[1], viewport[0]), dtype="uint8")
    else:
        frames = list(read_video(input_video_path, skip=input_video_skip))[:limit]

    parents = skeleton.parents()
    left = set(skeleton.joints_left() or [])

    fig = plt.figure(figsize=(size * (1 + len(poses)), size))
    ax_in = fig.add_subplot(1, 1 + len(poses), 1)
    ax_in.set_axis_off()
    ax_in.set_title("Input")

    radius = 1.7
    axes_3d = []
    for index, title in enumerate(poses):
        ax = fig.add_subplot(1, 1 + len(poses), index + 2, projection="3d")
        ax.view_init(elev=15.0, azim=azim)
        ax.set_xlim3d([-radius / 2, radius / 2])
        ax.set_zlim3d([0, radius])
        ax.set_ylim3d([-radius / 2, radius / 2])
        ax.set_xticklabels([])
        ax.set_yticklabels([])
        ax.set_zticklabels([])
        ax.set_title(title)
        axes_3d.append(ax)
    pose_list = list(poses.values())

    image = ax_in.imshow(frames[0], aspect="equal")
    points = ax_in.scatter(*keypoints[0].T, s=10, color="red", edgecolors="white", zorder=10)
    lines_3d = [[] for _ in pose_list]

    def update(i):
        image.set_data(frames[i] if i < len(frames) else frames[-1])
        points.set_offsets(keypoints[i])
        for p_idx, (ax, pos) in enumerate(zip(axes_3d, pose_list)):
            for artist in lines_3d[p_idx]:
                artist.remove()
            lines_3d[p_idx] = []
            for j, parent in enumerate(parents):
                if parent < 0:
                    continue
                col = "black" if j in left else "red"
                (ln,) = ax.plot(
                    [pos[i, j, 0], pos[i, parent, 0]],
                    [pos[i, j, 1], pos[i, parent, 1]],
                    [pos[i, j, 2], pos[i, parent, 2]],
                    zdir="z", c=col,
                )
                lines_3d[p_idx].append(ln)
        return []

    anim = FuncAnimation(fig, update, frames=limit, interval=1000.0 / fps, blit=False)
    if output.endswith(".mp4"):
        writer = writers["ffmpeg"](fps=fps, bitrate=bitrate)
        anim.save(output, writer=writer)
    elif output.endswith(".gif"):
        anim.save(output, dpi=80, writer="pillow")
    else:
        raise ValueError(f"Unsupported output format ({output})")
    plt.close(fig)
