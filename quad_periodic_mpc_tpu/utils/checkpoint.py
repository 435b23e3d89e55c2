"""Checkpoint / resume for long Monte-Carlo sweeps and controller state.

The reference has no controller checkpointing (SURVEY.md section 5 —
closest analogs are the backflip DataReader and the elevation-map
save/load services); for hour-scale sharded sweeps this module persists
any pytree of arrays (ControllerState, EstimatorState, PlantState,
sweep accumulators) via orbax, with a plain-npz fallback.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np
import jax


def _flatten(tree: Any):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save(path: str | Path, tree: Any, step: int | None = None) -> None:
    """Persist a pytree of arrays.  Uses orbax when importable, else npz."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path.absolute(), tree, force=True)
        return
    except Exception:
        pass

    leaves, treedef = _flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(str(path) + ".npz", **arrays)
    meta = {"n_leaves": len(leaves), "step": step}
    Path(str(path) + ".json").write_text(json.dumps(meta))


def restore(path: str | Path, template: Any) -> Any:
    """Restore a pytree saved by save(); template provides the structure."""
    path = Path(path)
    try:
        import orbax.checkpoint as ocp

        if path.exists():
            ckptr = ocp.PyTreeCheckpointer()
            restored = ckptr.restore(path.absolute(), item=template)
            return restored
    except Exception:
        pass

    data = np.load(str(path) + ".npz")
    leaves, treedef = _flatten(template)
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    import jax.numpy as jnp

    new_leaves = [jnp.asarray(x) for x in new_leaves]
    return jax.tree.unflatten(treedef, new_leaves)
