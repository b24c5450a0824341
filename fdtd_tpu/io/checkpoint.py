"""Simulation checkpoint / resume.

The reference has NO simulation-state persistence (SURVEY.md §5: "Checkpoint
/ resume: none"); this is a from-scratch capability. A checkpoint is a
single .npz with every leaf of the state pytree (SimState or EngineState —
psi/aux included), the tick, and a JSON metadata blob (grid shape,
resolution, dtype, user tags) so a resumed run can validate compatibility.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]

_FORMAT = "fdtd-tpu-checkpoint"
_VERSION = 1


def save_checkpoint(path, state, metadata: Optional[Dict[str, Any]] = None) -> Path:
    """Write the state pytree to ``path`` (.npz). Device arrays are pulled
    to host; the structure is recorded via jax.tree flattening with paths."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {}
    keys = []
    for key_path, leaf in leaves_with_paths:
        key = jax.tree_util.keystr(key_path)
        keys.append(key)
        arrays[f"leaf{len(keys)-1}"] = np.asarray(leaf)
    header = {
        "format": _FORMAT,
        "version": _VERSION,
        "state_class": type(state).__name__,
        "keys": keys,
        "metadata": metadata or {},
    }
    arrays["__header__"] = np.frombuffer(
        json.dumps(header).encode("utf-8"), dtype=np.uint8
    )
    with open(path, "wb") as f:
        np.savez(f, **arrays)
    return path


def load_checkpoint(path, template=None) -> Tuple[Any, Dict[str, Any]]:
    """Load (state, metadata). With a ``template`` pytree (e.g. sim.init()),
    the saved leaves are restored into its structure (validating count and
    shapes); without one, returns (dict of key -> array, metadata)."""
    with np.load(Path(path), allow_pickle=False) as z:
        header = json.loads(bytes(z["__header__"]).decode("utf-8"))
        if header.get("format") != _FORMAT:
            raise ValueError(f"{path} is not a fdtd-tpu checkpoint")
        leaves = [z[f"leaf{i}"] for i in range(len(header["keys"]))]
    metadata = header.get("metadata", {})
    if template is None:
        return dict(zip(header["keys"], leaves)), metadata
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template expects "
            f"{len(t_leaves)} ({header['state_class']} vs "
            f"{type(template).__name__}?)"
        )
    import jax.numpy as jnp

    import warnings

    restored = []
    for t, l in zip(t_leaves, leaves):
        if tuple(t.shape) != tuple(l.shape):
            raise ValueError(
                f"leaf shape mismatch: checkpoint {l.shape} vs template {t.shape}"
            )
        src_dt = jnp.asarray(l).dtype
        narrowing = (
            src_dt != t.dtype
            and jnp.issubdtype(t.dtype, jnp.floating)
            and jnp.issubdtype(src_dt, jnp.floating)
            and jnp.finfo(t.dtype).bits < jnp.finfo(src_dt).bits
        )
        if narrowing:
            warnings.warn(
                f"checkpoint leaf dtype {src_dt} narrowed to template dtype "
                f"{t.dtype}: precision is lost on restore",
                stacklevel=2,
            )
        restored.append(jnp.asarray(l, t.dtype))
    return jax.tree_util.tree_unflatten(treedef, restored), metadata
