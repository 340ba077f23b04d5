"""Checkpoint save/restore via orbax — sharding-aware, step-keyed.

Parity: the reference saves `{n_iter, model_state_dict,
optimizer_state_dict, loss}` every save_interval
(Train_model_frontend.py:107-113,340-353; utils/utils.py:534-549) and
per-epoch `{epoch, net}` for SuperGlue (superpoint_glue_train.py:159-167),
with manual `module.` prefix fixups for DataParallel. Here the whole
TrainState pytree (params + batch_stats + opt state + step) round-trips
through orbax, which restores arrays onto whatever mesh/sharding the
template carries — the multi-host story comes for free.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from image_matching_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState, wait: bool = False) -> int:
        step = int(state.step)
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if wait:
            self._mgr.wait_until_finished()
        return step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure (and shardings) of `state`."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def load_submodule_checkpoints(
    model,
    variables: dict,
    cfg,
    example_image,
    sp_checkpoint: Optional[str] = None,
    sg_checkpoint: Optional[str] = None,
) -> dict:
    """Merge trainer-saved SuperPoint / SuperGlue states into a composed
    `Matching` model's variables.

    The trainers checkpoint each sub-model's own TrainState (the way the
    reference saves separate superPointNet_*.pth.tar and SuperGlue
    epoch files); the eval CLIs compose them back under the Matching
    module's `superpoint` / `superglue` scopes.
    """
    import jax
    import jax.numpy as jnp

    from image_matching_tpu.models.superglue import SuperGlue
    from image_matching_tpu.models.superpoint import SuperPointBN, SuperPointVGG
    from image_matching_tpu.train.state import create_train_state

    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))

    def _load(path, st):
        """Orbax checkpoint dir, or a portable .npz from
        scripts/export_weights.py (utils/weights.py)."""
        if path.endswith(".npz"):
            from image_matching_tpu.utils.weights import load_npz_into

            loaded = load_npz_into(
                {"params": st.params, "batch_stats": st.batch_stats}, path
            )
            return st.replace(
                params=loaded["params"], batch_stats=loaded["batch_stats"]
            )
        return CheckpointManager(path).restore(st)

    if sp_checkpoint:
        sp_cls = SuperPointBN if cfg.backbone == "bn" else SuperPointVGG
        sp = sp_cls(descriptor_dim=cfg.descriptor_dim, dtype=cfg.dtype)
        st = create_train_state(
            jax.random.PRNGKey(0), sp, (example_image,),
            init_kwargs={"train": True},
        )
        st = _load(sp_checkpoint, st)
        params["superpoint"] = st.params
        if st.batch_stats is not None:
            batch_stats["superpoint"] = st.batch_stats

    if sg_checkpoint:
        from image_matching_tpu.structs import Keypoints

        sg = SuperGlue(
            descriptor_dim=cfg.descriptor_dim,
            keypoint_encoder=cfg.keypoint_encoder,
            gnn_layers=cfg.gnn_layers,
            sinkhorn_iterations=cfg.sinkhorn_iterations,
            match_threshold=cfg.match_threshold,
            attention_impl=cfg.attention_impl,
            dtype=cfg.dtype,
        )
        k = 8
        kp = Keypoints(
            xy=jnp.zeros((1, k, 2)),
            score=jnp.zeros((1, k)),
            mask=jnp.ones((1, k), bool),
            desc=jnp.zeros((1, k, cfg.descriptor_dim)),
        )
        shape = (example_image.shape[1], example_image.shape[2])
        st = create_train_state(
            jax.random.PRNGKey(0), sg, (kp, kp, shape, shape),
            init_kwargs={"train": True},
        )
        st = _load(sg_checkpoint, st)
        params["superglue"] = st.params
        if st.batch_stats is not None:
            batch_stats["superglue"] = st.batch_stats

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out
