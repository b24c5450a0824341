"""Offline 3D scene preview.

The headless counterpart of the reference's interactive renderer
(cem-render: wgpu PBR pipelines, camera orbiting, egui scene view) at the
fidelity a TPU workflow needs: a matplotlib 3D render of the scene's
entities (wireframe AABBs colored by component role, source markers,
observer planes) written to a PNG for notebooks/reports.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["render_scene_preview"]

_ROLE_COLORS = {
    "material": "#4878cf",
    "source": "#d65f5f",
    "observer": "#6acc65",
    "pml": "#b47cc7",
}


def render_scene_preview(
    scene,
    path,
    *,
    title: Optional[str] = None,
    dpi: int = 110,
) -> Path:
    """Render entity bounding boxes + markers to ``path`` (PNG)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")

    def draw_aabb(mins, maxs, color, label):
        x0, y0, z0 = mins
        x1, y1, z1 = maxs
        pts = np.array(
            [
                [x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0],
                [x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1],
            ]
        )
        edges = [
            (0, 1), (1, 2), (2, 3), (3, 0),
            (4, 5), (5, 6), (6, 7), (7, 4),
            (0, 4), (1, 5), (2, 6), (3, 7),
        ]
        for a, b in edges:
            ax.plot(*zip(pts[a], pts[b]), color=color, linewidth=1.0, alpha=0.8)
        c = pts.mean(axis=0)
        ax.text(c[0], c[1], c[2], label, fontsize=7, color=color)

    for e in scene.entities:
        role = (
            "source" if e.source is not None
            else "pml" if e.pml is not None
            else "observer" if e.observer is not None
            else "material"
        )
        color = _ROLE_COLORS[role]
        ab = e.world_aabb()
        if ab is not None:
            draw_aabb(ab[0], ab[1], color, e.name or type(e.shape).__name__)
        else:
            t = e.global_pose().translation
            ax.scatter([t[0]], [t[1]], [t[2]], color=color, marker="*", s=60)
            if e.name:
                ax.text(t[0], t[1], t[2], e.name, fontsize=7, color=color)

    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    if title:
        ax.set_title(title)
    handles = [
        plt.Line2D([0], [0], color=c, label=role)
        for role, c in _ROLE_COLORS.items()
    ]
    ax.legend(handles=handles, loc="upper left", fontsize=7)

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return path
