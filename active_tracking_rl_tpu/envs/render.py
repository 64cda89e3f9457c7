"""Episode rendering (reference track_1v1.py:170-216 matplotlib path and
utils.py:84-89 cv2 helper).

The reference paints the maze matrix with agent colors and draws motion
traces in a matplotlib figure. Here rendering is a host-side pure function
of (config, EnvState, traces):

  * ``mode="rgb_array"`` -> (S, S, 3) uint8 image (same palette idea:
    free=white, wall=black, tracker=blue, target=red, traces tinted),
  * ``mode="ansi"``      -> compact unicode text grid (terminal debugging),
  * ``mode="human"``     -> matplotlib imshow if available, else prints ansi.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from active_tracking_rl_tpu.config import EnvConfig

#: cell palette: value -> RGB (reference uses matplotlib colormaps over the
#: painted matrix values 0..6, track_1v1.py:251-262).
_PALETTE = {
    0: (255, 255, 255),   # free
    1: (40, 40, 40),      # wall
    2: (50, 90, 255),     # tracker
    3: (120, 200, 255),   # tracker trace
    4: (255, 60, 60),     # target
    5: (255, 170, 170),   # target trace
    6: (180, 120, 255),   # extra agents
}

_GLYPH = {0: "·", 1: "█", 2: "T", 3: "t", 4: "X", 5: "x", 6: "?"}


def _painted_grid(cfg: EnvConfig, state,
                  traces: Optional[Sequence[np.ndarray]] = None) -> np.ndarray:
    """Maze with agents (2+2i) and traces (3+2i) painted, uint8 grid."""
    p = cfg.pob_size
    s = cfg.maze_size
    maze = np.asarray(state.maze)[p:p + s, p:p + s].copy()
    if traces:
        for snap in traces[:-1]:
            for i, (r, c) in enumerate(np.asarray(snap)):
                if maze[r, c] == 0:
                    maze[r, c] = 3 + 2 * min(i, 1)
    pos = np.asarray(state.pos)
    for i, (r, c) in enumerate(pos):
        maze[r, c] = 2 + 2 * min(i, 2)
    return maze


def to_rgb(grid: np.ndarray) -> np.ndarray:
    img = np.zeros(grid.shape + (3,), np.uint8)
    for v, rgb in _PALETTE.items():
        img[grid == v] = rgb
    return img


def to_ansi(grid: np.ndarray) -> str:
    return "\n".join("".join(_GLYPH.get(int(v), "?") for v in row)
                     for row in grid)


def render_state(cfg: EnvConfig, state,
                 traces: Optional[Sequence[np.ndarray]] = None,
                 mode: str = "rgb_array"):
    grid = _painted_grid(cfg, state, traces)
    if mode == "ansi":
        return to_ansi(grid)
    img = to_rgb(grid)
    if mode == "rgb_array":
        return img
    if mode == "human":
        try:
            import matplotlib.pyplot as plt
            plt.imshow(img)
            plt.axis("off")
            plt.pause(0.01)
        except ImportError:
            print(to_ansi(grid))
        return None
    raise ValueError(f"unknown render mode {mode!r}")


def save_episode_gif(frames: List[np.ndarray], path: str,
                     duration_ms: int = 60) -> None:
    """Save an episode of rgb_array frames (optional PIL dependency)."""
    from PIL import Image
    imgs = [Image.fromarray(f).resize((f.shape[1] * 4, f.shape[0] * 4),
                                      Image.NEAREST) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=duration_ms, loop=0)
