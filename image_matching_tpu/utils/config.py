"""Config plumbing: YAML → nested dict with recursive default merge.

Parity: the reference's two config styles — YAML + recursive
`dict_update` over per-class defaults (utils/utils.py:55-61,
utils/tools.py:7-22) and argparse-assembled nested dicts
(superpoint_glue_test.py:16-56). The typed side of this framework lives
in the NamedTuple/struct configs next to each component
(MatchingConfig, SuperPointLossConfig, ExportConfig, WarpedPairConfig…);
this module handles the YAML file I/O and merging, plus snapshotting the
merged config into the run directory the way the reference does
(superpoint_train_descriptor.py:33-34).
"""
from __future__ import annotations

import os
from typing import Mapping, Optional

import yaml


def dict_update(d: dict, u: Mapping) -> dict:
    """Recursively merge `u` into `d` (reference utils/utils.py:55-61)."""
    d = dict(d)
    for k, v in u.items():
        if isinstance(v, Mapping) and isinstance(d.get(k), Mapping):
            d[k] = dict_update(d[k], v)
        else:
            d[k] = v
    return d


def load_config(path: str, defaults: Optional[dict] = None) -> dict:
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    if defaults:
        cfg = dict_update(defaults, cfg)
    return cfg


def snapshot_config(cfg: dict, run_dir: str, name: str = "config.yml") -> str:
    os.makedirs(run_dir, exist_ok=True)
    out = os.path.join(run_dir, name)
    with open(out, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    return out
