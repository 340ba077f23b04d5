"""Fresh end-to-end decomposition of the headline program (round 3).

Slope-times (bench.py methodology) the three stages of the flagship
forward separately — backbone raw maps, detect postprocess, SuperGlue
stack — at the headline config, to re-derive the perf ledger after the
H-s2d backbone landed.

  python scripts/probe_decomp.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, H, W, K, D = 4, 480, 640, 1024, 256  # B pairs -> 2B images
N_SMALL, N_LARGE = 2, 8


def timed(fn, stacks, label):
    @partial(jax.jit, static_argnames=("n",))
    def run_n(arrs, n):
        def body(c, xs):
            out = fn(*xs)
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(out))
            return c + tot, None
        tot, _ = jax.lax.scan(
            body, jnp.zeros(()), tuple(a[:n] for a in arrs))
        return tot

    def t(n, reps=3):
        float(run_n(stacks, n))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run_n(stacks, n))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t(N_LARGE) - t(N_SMALL)) / (N_LARGE - N_SMALL)
    print(f"{label}: {per*1e3:.3f} ms", flush=True)
    return per


def main():
    from image_matching_tpu.models.matching import Matching, MatchingConfig
    from image_matching_tpu.models.superglue import SuperGlue
    from image_matching_tpu.models.superpoint import superpoint_postprocess
    from image_matching_tpu.structs import Keypoints

    cfg = MatchingConfig(
        backbone="bn", descriptor_dim=D, max_keypoints=K,
        keypoint_threshold=0.005, gnn_layers=18, sinkhorn_iterations=30,
        match_threshold=0.1, compute_dtype="bfloat16",
    )
    model = Matching(cfg)
    img = jnp.zeros((1, H, W, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, img)

    dev = jax.jit(lambda s, d: jax.random.uniform(jax.random.PRNGKey(s), d))
    imgs = jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(1), (N_LARGE, 2 * B, H, W, 1)))()

    # 1. backbone raw maps
    sp_vars = {"params": variables["params"]["superpoint"],
               "batch_stats": variables["batch_stats"]["superpoint"]}
    sp = model.bind(variables).superpoint

    def backbone(x):
        return sp.clone().apply(sp_vars, x)

    timed(backbone, (imgs,), "backbone raw maps (2B imgs)")

    # 2. postprocess on raw maps
    outs = jax.jit(lambda x: sp.clone().apply(sp_vars, x))(imgs[0])
    semi_s = jax.jit(lambda: jnp.broadcast_to(
        outs["semi"], (N_LARGE,) + outs["semi"].shape).copy())()
    desc_s = jax.jit(lambda: jnp.broadcast_to(
        outs["desc_map"], (N_LARGE,) + outs["desc_map"].shape).copy())()

    def post(semi, desc_map):
        return superpoint_postprocess(
            {"semi": semi, "desc_map": desc_map}, K,
            threshold=cfg.keypoint_threshold)

    timed(post, (semi_s, desc_s), "detect postprocess (2B imgs)")

    # 3. SuperGlue stack
    sg_vars = {"params": variables["params"]["superglue"],
               "batch_stats": variables["batch_stats"]["superglue"]}
    sg = SuperGlue(
        descriptor_dim=D, keypoint_encoder=cfg.keypoint_encoder,
        gnn_layers=18, sinkhorn_iterations=30, match_threshold=0.1,
        dtype=jnp.bfloat16)

    def kps(seed):
        return Keypoints(
            xy=jax.random.uniform(jax.random.PRNGKey(seed),
                                  (N_LARGE, B, K, 2)) * 600,
            score=jax.random.uniform(jax.random.PRNGKey(seed + 1),
                                     (N_LARGE, B, K)),
            desc=jax.random.normal(jax.random.PRNGKey(seed + 2),
                                   (N_LARGE, B, K, D)),
            mask=jnp.ones((N_LARGE, B, K), bool),
        )

    k0, k1 = jax.jit(lambda: kps(3))(), jax.jit(lambda: kps(7))()

    def glue(xy0, sc0, d0, m0, xy1, sc1, d1, m1):
        r = sg.apply(sg_vars,
                     Keypoints(xy=xy0, score=sc0, desc=d0, mask=m0),
                     Keypoints(xy=xy1, score=sc1, desc=d1, mask=m1),
                     (H, W), (H, W))
        return r["matching_scores0"]

    timed(glue, (k0.xy, k0.score, k0.desc, k0.mask,
                 k1.xy, k1.score, k1.desc, k1.mask),
          "superglue stack (B pairs)")


if __name__ == "__main__":
    main()
