"""Slope-time the SuperGlue stack alone at the bench config.

Isolates the SG forward (kenc + 18L GNN + final proj + sinkhorn +
extraction) from the backbone, at B pairs x K keypoints, bf16, with
switchable attention impl and side stacking — the decomposition data
behind the round-3 perf work.

  python scripts/probe_sg.py [--batch 4 8] [--k 1024] [--impl einsum flash]
"""
import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.append(".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, nargs="+", default=[4, 8])
    p.add_argument("--k", type=int, default=1024)
    p.add_argument("--impl", nargs="+", default=["einsum"])
    p.add_argument("--logits", nargs="+", default=["float32"],
                   help="einsum logits storage dtype(s) to probe")
    p.add_argument("--stack", type=int, nargs="+", default=[0, 1])
    p.add_argument("--iters", type=int, default=40)
    args = p.parse_args()

    from image_matching_tpu.models.superglue import SuperGlue
    from image_matching_tpu.structs import Keypoints

    k = args.k
    for b in args.batch:
        rng = np.random.default_rng(0)
        kp = lambda: Keypoints(
            xy=jnp.asarray(rng.uniform(0, 600, (b, k, 2)), jnp.float32),
            score=jnp.asarray(rng.uniform(0.1, 1, (b, k)), jnp.float32),
            desc=jnp.asarray(rng.normal(0, 1, (b, k, 256)), jnp.float32),
            mask=jnp.ones((b, k), bool),
        )
        kpts0, kpts1 = kp(), kp()
        for impl in args.impl:
          for ldt in args.logits:
            for stack in args.stack:
                model = SuperGlue(
                    descriptor_dim=256, keypoint_encoder=(32, 64, 128, 256),
                    gnn_layers=18, sinkhorn_iterations=30,
                    match_threshold=0.1, dtype=jnp.bfloat16,
                    attention_impl=impl, logits_dtype=ldt,
                    stack_sides=bool(stack),
                )
                variables = jax.jit(model.init)(
                    jax.random.PRNGKey(0), kpts0, kpts1, (480, 640), (480, 640)
                )

                def fwd(variables, kpts0, kpts1):
                    return model.apply(variables, kpts0, kpts1, (480, 640), (480, 640))

                @jax.jit
                def run(variables, kpts0, kpts1):
                    def body(c, _):
                        out = fwd(variables, kpts0, kpts1)
                        # carry-dependence: shift scores into the next xy
                        kp0 = kpts0.replace(
                            xy=kpts0.xy + c * 1e-6
                        )
                        out2 = fwd(variables, kp0, kpts1)
                        return out2["matching_scores0"].sum(), ()
                    c, _ = jax.lax.scan(body, 0.0, None, length=args.iters // 2)
                    return c

                # read the scalar back — through the relay
                # block_until_ready can acknowledge early (see bench.py)
                float(run(variables, kpts0, kpts1))
                t0 = time.perf_counter()
                float(run(variables, kpts0, kpts1))
                dt = (time.perf_counter() - t0) / (args.iters // 2)
                print(f"B={b} impl={impl} logits={ldt} stack={stack}: {dt*1e3:.3f} ms/fwd "
                      f"({dt*1e3/b:.3f} ms/pair-side-set)", flush=True)


if __name__ == "__main__":
    main()
