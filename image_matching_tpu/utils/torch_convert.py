"""Convert torch checkpoints (MagicLeap naming) to this framework's params.

The reference loads `.pth`/`.pth.tar` state dicts
(superglue/models/superpoint.py:136-137, superglue_test.py:223-228,
superpoint/models/superpoint_test.py:88-99 — including the DataParallel
`module.` prefix strip). Those blobs are unfetched LFS stubs in the
mounted copy, so value-level parity can't be checked here; this
converter implements the *name and layout* mapping for anyone holding
real weights, and is unit-tested against synthetic state dicts with the
official naming scheme.

Layout notes:
  * torch Conv2d weight (O, I, kH, kW) → flax Conv kernel (kH, kW, I, O)
  * torch Conv1d weight (O, I, 1) → flax Dense kernel (I, O)
  * torch Linear weight (O, I) → flax Dense kernel (I, O)
  * BatchNorm: weight/bias → scale/bias; running stats → batch_stats
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _strip_module(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {
        (k[7:] if k.startswith("module.") else k): v for k, v in state.items()
    }


def _conv2d(state, name):
    w = np.asarray(state[f"{name}.weight"])
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{name}.bias" in state:
        out["bias"] = np.asarray(state[f"{name}.bias"])
    return out


def _dense_from_conv1d(state, name):
    w = np.asarray(state[f"{name}.weight"])  # (O, I, 1)
    out = {"kernel": w[..., 0].T}
    if f"{name}.bias" in state:
        out["bias"] = np.asarray(state[f"{name}.bias"])
    return out


def _bn(state, name) -> Tuple[dict, dict]:
    params = {
        "scale": np.asarray(state[f"{name}.weight"]),
        "bias": np.asarray(state[f"{name}.bias"]),
    }
    stats = {
        "mean": np.asarray(state[f"{name}.running_mean"]),
        "var": np.asarray(state[f"{name}.running_var"]),
    }
    return params, stats


def convert_superpoint_vgg(state: Dict[str, np.ndarray]) -> dict:
    """Official MagicLeap SuperPoint (conv1a..convDb, no BN) →
    `SuperPointVGG` variables {"params": ...}."""
    state = _strip_module(state)
    names = [
        "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
        "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb",
    ]
    params = {n: _conv2d(state, n) for n in names}
    return {"params": params}


def convert_superglue(state: Dict[str, np.ndarray], gnn_layers: int = 18) -> dict:
    """Official SuperGlue naming → `SuperGlue` variables.

    torch names: kenc.encoder.{i} (Conv1d/BN alternating), gnn.layers.{L}
    with attn.proj.{0,1,2} (q,k,v), attn.merge, mlp.{i}; final_proj;
    bin_score.
    """
    state = _strip_module(state)
    params: dict = {}
    batch_stats: dict = {}

    def mlp_scope(prefix):
        """Sequential MLP: Conv1d / BN / ReLU slots (ReLU carries no
        weights, so scan every index that appears under the prefix)."""
        idxs = sorted(
            {
                int(k[len(prefix) + 1:].split(".")[0])
                for k in state
                if k.startswith(prefix + ".")
            }
        )
        scope_p, scope_s = {}, {}
        dense_i = 0
        bn_i = 0
        for i in idxs:
            key = f"{prefix}.{i}.weight"
            if key not in state:
                continue
            w = np.asarray(state[key])
            if w.ndim == 3:  # Conv1d
                scope_p[f"Dense_{dense_i}"] = _dense_from_conv1d(state, f"{prefix}.{i}")
                dense_i += 1
            elif w.ndim == 1 and f"{prefix}.{i}.running_mean" in state:  # BN
                p, s = _bn(state, f"{prefix}.{i}")
                scope_p[f"MaskedBatchNorm1d_{bn_i}"] = p
                scope_s[f"MaskedBatchNorm1d_{bn_i}"] = s
                bn_i += 1
        return scope_p, scope_s

    kenc_p, kenc_s = mlp_scope("kenc.encoder")
    params["kenc"] = kenc_p
    if kenc_s:
        batch_stats["kenc"] = kenc_s

    gnn_p, gnn_s = {}, {}
    for li in range(gnn_layers):
        lname = f"layer_{li}_{'self' if li % 2 == 0 else 'cross'}"
        attn = {
            "proj_q": _dense_from_conv1d(state, f"gnn.layers.{li}.attn.proj.0"),
            "proj_k": _dense_from_conv1d(state, f"gnn.layers.{li}.attn.proj.1"),
            "proj_v": _dense_from_conv1d(state, f"gnn.layers.{li}.attn.proj.2"),
            "merge": _dense_from_conv1d(state, f"gnn.layers.{li}.attn.merge"),
        }
        mlp_p, mlp_s = mlp_scope(f"gnn.layers.{li}.mlp")
        gnn_p[lname] = {"attn": attn, "mlp": mlp_p}
        if mlp_s:
            gnn_s[lname] = {"mlp": mlp_s}
    params["gnn"] = gnn_p
    if gnn_s:
        batch_stats["gnn"] = gnn_s

    params["final_proj"] = _dense_from_conv1d(state, "final_proj")
    params["bin_score"] = np.asarray(state["bin_score"]).reshape(())

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth/.pth.tar file into numpy (handles the reference's
    {'model_state_dict': ...} / {'net': ...} wrappers)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict):
        for key in ("model_state_dict", "net", "state_dict"):
            if key in blob:
                blob = blob[key]
                break
    if hasattr(blob, "state_dict"):
        blob = blob.state_dict()
    return {k: v.detach().numpy() for k, v in blob.items()}
