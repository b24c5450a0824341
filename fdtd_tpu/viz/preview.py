"""Offline 3D scene preview with shaded shape geometry.

The headless counterpart of the reference's interactive renderer
(cem-render: wgpu PBR pipelines, camera orbiting, egui scene view) at the
fidelity a TPU workflow needs: shapes are triangulated by viz/mesh.py
(the analog of cem-render/src/mesh/parry.rs:44-152) and rendered as
flat-shaded matplotlib Poly3DCollections — a Ball reads as a sphere, a
Cylinder as a cylinder, a HalfSpace as a ground plane — with source
markers and observer planes, written to PNG for notebooks/reports."""

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
    camera=None,
) -> Path:
    """Render shaded entity geometry + markers to ``path`` (PNG).

    ``camera`` (a viz.camera.Camera) sets the viewpoint: its forward
    vector maps to the matplotlib elevation/azimuth — so the same Camera
    driven by fit/orbit/pan_tilt also frames the offline preview (the
    composer's scene-view + camera-proxy pairing, headless)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    from ..scene.shapes import HalfSpace
    from .mesh import transform_mesh, triangulate

    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")

    # a finite extent for unbounded shapes: half the span of bounded ones
    spans = []
    for e in scene.entities:
        if e.shape is not None and not isinstance(e.shape, HalfSpace):
            ab = e.world_aabb()
            if ab is not None and np.all(np.isfinite(ab[1] - ab[0])):
                spans.append(float(np.max(ab[1] - ab[0])))
    extent = max(spans) if spans else 10.0

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

    drew_mesh = False
    for e in scene.entities:
        role = (
            "source" if e.source is not None
            else "pml" if e.pml is not None
            else "observer" if e.observer is not None
            else "material"
        )
        color = _ROLE_COLORS[role]
        label = e.name or (
            type(e.shape).__name__ if e.shape is not None else ""
        )
        if e.shape is not None:
            try:
                verts, faces = triangulate(e.shape, extent=extent)
            except TypeError:
                verts = faces = None
            if verts is not None:
                world = transform_mesh(verts, e.global_pose())
                tris = world[faces]
                alpha = 0.35 if isinstance(e.shape, HalfSpace) else 0.85
                coll = Poly3DCollection(
                    tris, facecolors=color, alpha=alpha, shade=True,
                    linewidths=0,
                )
                ax.add_collection3d(coll)
                c = world.mean(axis=0)
                if label:
                    ax.text(c[0], c[1], c[2], label, fontsize=7, color=color)
                drew_mesh = True
                continue
        ab = e.world_aabb()
        if ab is not None and np.all(np.isfinite(ab[0])) and np.all(
            np.isfinite(ab[1])
        ):
            draw_aabb(ab[0], ab[1], color, label)
        else:
            t = e.global_pose().translation
            ax.scatter([t[0]], [t[1]], [t[2]], color=color, marker="*", s=60)
            if e.name:
                ax.text(t[0], t[1], t[2], e.name, fontsize=7, color=color)

    if drew_mesh:
        # Poly3DCollection doesn't feed autoscale: fit to world AABBs
        los, his = [], []
        for e in scene.entities:
            if e.shape is not None and not isinstance(e.shape, HalfSpace):
                ab = e.world_aabb()
                if ab is not None and np.all(np.isfinite(ab[1])):
                    los.append(ab[0])
                    his.append(ab[1])
        if los:
            lo = np.min(los, axis=0) - 0.05 * extent
            hi = np.max(his, axis=0) + 0.05 * extent
            ax.set_xlim(lo[0], hi[0])
            ax.set_ylim(lo[1], hi[1])
            ax.set_zlim(lo[2], hi[2])

    if camera is not None:
        import math

        v = -np.asarray(camera.forward, np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        ax.view_init(
            elev=math.degrees(math.asin(float(np.clip(v[2], -1, 1)))),
            azim=math.degrees(math.atan2(float(v[1]), float(v[0]))),
        )

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
