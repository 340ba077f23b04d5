"""Export an orbax training checkpoint to a portable .npz weight file.

  python scripts/export_weights.py --kind sp \
      --checkpoint runs/sp_synth_tpu/checkpoints --out weights/sp_synth.npz

The npz holds {params, batch_stats} flattened by tree path
(utils/weights.py) — small enough to commit, loadable without the
optimizer state. The reverse of the reference's .pth distribution model.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_template(kind, descriptor_dim, height, width, tx=None):
    from image_matching_tpu.train.state import create_train_state

    if kind == "sp":
        from image_matching_tpu.models.superpoint import SuperPointBN

        model = SuperPointBN(descriptor_dim=descriptor_dim, dtype=jnp.bfloat16)
        example = jnp.zeros((1, height, width, 1))
        return create_train_state(
            jax.random.PRNGKey(0), model, (example,),
            tx=tx, init_kwargs={"train": True},
        )
    from image_matching_tpu.models.superglue import SuperGlue
    from image_matching_tpu.structs import Keypoints

    model = SuperGlue(descriptor_dim=descriptor_dim,
                      keypoint_encoder=(32, 64, 128),
                      dtype=jnp.bfloat16)
    k = 8
    kp = Keypoints(xy=jnp.zeros((1, k, 2)), score=jnp.zeros((1, k)),
                   mask=jnp.ones((1, k), bool),
                   desc=jnp.zeros((1, k, descriptor_dim)))
    return create_train_state(
        jax.random.PRNGKey(0), model, (kp, kp, (height, width), (height, width)),
        tx=tx, init_kwargs={"train": True},
    )


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", choices=["sp", "sg"], required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--descriptor_dim", type=int, default=128)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--step", type=int, default=None)
    args = p.parse_args()

    import optax

    from image_matching_tpu.train.checkpoint import CheckpointManager
    from image_matching_tpu.train.state import create_train_state
    from image_matching_tpu.utils.weights import save_npz

    mgr = CheckpointManager(args.checkpoint)
    # the opt_state tree depends on how the run built its optimizer
    # (constant lr vs schedule) — try the common shapes until one
    # matches the on-disk structure; only params/batch_stats are kept
    last_err = None
    for tx in (
        optax.adam(1e-4),
        optax.adam(optax.cosine_decay_schedule(1e-4, 1)),
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4)),
    ):
        st = build_template(args.kind, args.descriptor_dim, args.height,
                            args.width, tx=tx)
        try:
            st = mgr.restore(st, step=args.step)
            break
        except ValueError as e:
            last_err = e
    else:
        raise last_err
    save_npz(args.out, {"params": st.params, "batch_stats": st.batch_stats})
    size = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size:.1f} MB) from step {int(st.step)}")


if __name__ == "__main__":
    main()
