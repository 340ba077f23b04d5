"""Portable weight snapshots: pytree <-> flat .npz.

The reference distributes trained weights as torch ``.pth``/``.pth.tar``
blobs (``/root/reference/superpoint_flann_test.py:23``,
``superpoint_glue_train.py:159-167``). Orbax checkpoints (the training
format here) are directory trees keyed to a TrainState template — fine
for resume, awkward as a release artifact. This module flattens any
variables pytree to a single compressed ``.npz`` keyed by tree path, so
trained weights can be committed to the repo and reloaded into a freshly
initialised model without an optimizer-state template.

bfloat16 leaves are stored as float32 (npz has no bf16) and cast back to
the template leaf's dtype on load.
"""
from __future__ import annotations

import io
import os
from typing import Any, Dict

import jax
import numpy as np

_SEP = "::"


def _keystr(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return _SEP.join(parts)


def flatten_tree(tree: Any) -> Dict[str, np.ndarray]:
    """Flatten a pytree of arrays to {path: np.ndarray}."""
    out: Dict[str, np.ndarray] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype == jax.numpy.bfloat16:
            arr = arr.astype(np.float32)
        out[_keystr(path)] = arr
    return out


def save_npz(path: str, tree: Any) -> None:
    """Write a variables pytree as one compressed npz file."""
    flat = flatten_tree(tree)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    # write via a buffer then one atomic rename so a crashed export
    # never leaves a truncated artifact in the repo
    buf = io.BytesIO()
    np.savez_compressed(buf, **flat)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_npz_into(template: Any, path: str) -> Any:
    """Fill `template`'s leaves from an npz written by `save_npz`.

    Leaves are matched by tree path; every template leaf must be present
    in the file (extra file entries are an error too — a mismatch means
    the architecture changed since export).
    """
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    paths_leaves = jax.tree_util.tree_flatten_with_path(template)
    treedef = paths_leaves[1]
    keys = [_keystr(p) for p, _ in paths_leaves[0]]
    missing = [k for k in keys if k not in flat]
    extra = sorted(set(flat) - set(keys))
    if missing or extra:
        raise KeyError(
            f"weight file {path} does not match template: "
            f"missing={missing[:5]} extra={extra[:5]} "
            f"({len(missing)} missing / {len(extra)} extra)"
        )
    leaves = []
    for key, (_, leaf) in zip(keys, paths_leaves[0]):
        arr = flat[key]
        want = jax.numpy.asarray(leaf)
        if arr.shape != want.shape:
            raise ValueError(
                f"{key}: shape {arr.shape} != template {want.shape}"
            )
        leaves.append(jax.numpy.asarray(arr, dtype=want.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
