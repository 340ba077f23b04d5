"""Long-context matching demo: 16k+ keypoints per image, end to end.

SURVEY §5's long-context deliverable, demonstrated for real (VERDICT r2
item 6): the reference caps keypoints at ~1200 because its dense N×M
attention and coupling live on one GPU (superglue_test.py:85-89); here

  * --backend tpu: the full detect+match pipeline on one chip — the
    "auto" attention resolves to the Pallas flash kernel at this size
    (FLASH_MIN_KEYPOINTS=2048, artifacts/attention_bench.json: einsum is
    224 ms/attention at 8k, flash 1.97 ms) and Sinkhorn falls back to the
    differentiable scan (coupling no longer fits VMEM);
  * --backend cpu_mesh: SuperGlue context-parallel over an 8-device
    mesh (ring attention + sharded Sinkhorn + distributed extraction),
    detection on one device.

Both report match count, precision vs the synthetic GT warp, and the
corner error of a homography RANSAC fit, merged into
artifacts/longcontext_demo.json so the backends can be compared.

  python scripts/longcontext_demo.py --backend tpu
  python scripts/longcontext_demo.py --backend cpu_mesh
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backend", choices=["tpu", "cpu_mesh"], required=True)
    p.add_argument("--k", type=int, default=16384)
    p.add_argument("--height", type=int, default=960)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--sp_checkpoint", default="weights/sp_photo.npz")
    p.add_argument("--sg_checkpoint", default="weights/sg_photo.npz")
    p.add_argument("--out", default="artifacts/longcontext_demo.json")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    if args.backend == "cpu_mesh":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.backend == "cpu_mesh":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from image_matching_tpu.evaluation import corner_error, make_eval_pairs
    from image_matching_tpu.models.matching import Matching, MatchingConfig
    from image_matching_tpu.ops.matching import gather_matched_points
    from image_matching_tpu.ops.ransac import ransac_homography
    from image_matching_tpu.structs import MatchResult
    from image_matching_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(args.seed)
    (pair,) = make_eval_pairs(
        rng, 1, args.height, args.width, max_angle=0.15,
        scale_range=(0.95, 1.05), max_shift=32.0, texture="photo",
    )
    img0 = jnp.asarray(pair.template)[None]
    img1 = jnp.asarray(pair.source)[None]

    cfg = MatchingConfig(
        backbone="bn", descriptor_dim=128, keypoint_encoder=(32, 64, 128),
        max_keypoints=args.k, keypoint_threshold=0.0, sinkhorn_iterations=30,
        match_threshold=0.1, sinkhorn_impl="scan",
    )
    model = Matching(cfg)
    example = jnp.zeros((1, args.height, args.width, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), example, example)
    from image_matching_tpu.train.checkpoint import load_submodule_checkpoints

    variables = load_submodule_checkpoints(
        model, variables, cfg, example,
        sp_checkpoint=args.sp_checkpoint, sg_checkpoint=args.sg_checkpoint,
    )

    if args.backend == "tpu":
        fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
        out = fwd(variables, img0, img1)
        jax.block_until_ready(out["matches0"])  # compile + first run

        # the relay can ack block_until_ready early, so wall-timing a
        # single call lies; time via an in-jit carry-dependent scan
        # (same methodology as bench.py / bench_attention.py)
        @functools.partial(jax.jit, static_argnames=("n",))
        def run_n(v, a, b, n):
            def body(img, _):
                o = model.apply(v, img, b)
                bump = (o["matching_scores0"].sum() * 1e-9).astype(a.dtype)
                return a + bump, None

            final, _ = jax.lax.scan(body, a, None, length=n)
            return final.sum()

        ns = (2, 6)
        float(run_n(variables, img0, img1, ns[0]))
        float(run_n(variables, img0, img1, ns[1]))
        ts = {}
        for n in ns:
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                float(run_n(variables, img0, img1, n))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        match_s = (ts[ns[1]] - ts[ns[0]]) / (ns[1] - ns[0])
        kp0, kp1 = out["keypoints0"], out["keypoints1"]
        matches0 = out["matches0"]
        scores0 = out["matching_scores0"]
    else:
        from jax.sharding import Mesh

        from image_matching_tpu.parallel.context_parallel import (
            make_context_parallel_superglue,
        )

        detect = jax.jit(
            lambda v, im: model.apply(v, im, method=model.detect)
        )
        both = detect(variables, jnp.concatenate([img0, img1], axis=0))
        kp0 = jax.tree_util.tree_map(lambda x: x[:1], both)
        kp1 = jax.tree_util.tree_map(lambda x: x[1:], both)
        jax.block_until_ready(kp0.xy)

        sg_vars = {
            "params": variables["params"]["superglue"],
            "batch_stats": variables["batch_stats"]["superglue"],
        }
        mesh = Mesh(np.array(jax.devices()[:8]), ("context",))
        cp = make_context_parallel_superglue(
            mesh, gnn_layers=cfg.gnn_layers,
            sinkhorn_iterations=cfg.sinkhorn_iterations,
            match_threshold=cfg.match_threshold,
        )
        shp = (args.height, args.width)
        cp_fn = jax.jit(lambda v, a, b: cp(v, a, b, shp, shp))
        m0, m1, s0, s1 = cp_fn(sg_vars, kp0, kp1)
        jax.block_until_ready(m0)
        t0 = time.perf_counter()
        m0, m1, s0, s1 = cp_fn(sg_vars, kp0, kp1)
        jax.block_until_ready(m0)
        match_s = time.perf_counter() - t0
        matches0, scores0 = m0, s0

    # ---- quality vs the exact GT warp ----
    xy0 = np.asarray(kp0.xy[0])
    xy1 = np.asarray(kp1.xy[0])
    m0_np = np.asarray(matches0[0])
    matched = m0_np >= 0
    n_matches = int(matched.sum())
    gt = pair.gt_matrix
    proj = xy0 @ gt[:, :2].T + gt[:, 2]
    err = np.linalg.norm(proj - xy1[np.clip(m0_np, 0, None)], axis=-1)
    prec3 = float((err[matched] < 3.0).mean()) if n_matches else 0.0
    prec5 = float((err[matched] < 5.0).mean()) if n_matches else 0.0

    mres = MatchResult(
        matches0=matches0, matches1=jnp.zeros_like(matches0),
        scores0=scores0, scores1=jnp.zeros_like(scores0),
    )
    p0, p1, valid = jax.vmap(gather_matched_points)(kp0.xy, kp1.xy, mres)
    fit = jax.jit(
        lambda k, a, b, v: ransac_homography(
            k, a, b, v, threshold=5.0, num_hypotheses=512, min_matches=10
        )
    )(jax.random.PRNGKey(1), p0[0], p1[0], valid[0])
    cerr = corner_error(
        np.asarray(fit.matrix), gt, args.height, args.width
    ) if bool(fit.valid) else None

    rec = {
        "backend": args.backend,
        "device": str(jax.devices()[0].device_kind),
        "k": args.k,
        "image": [args.height, args.width],
        "n_valid_kpts": [int(kp0.mask.sum()), int(kp1.mask.sum())],
        "n_matches": n_matches,
        "precision_at_3px": round(prec3, 4),
        "precision_at_5px": round(prec5, 4),
        "ransac_corner_err_px": None if cerr is None else round(cerr, 3),
        "ransac_inliers": int(fit.num_inliers),
        "match_seconds": round(match_s, 3),
    }
    print(json.dumps(rec), flush=True)

    merged = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
    merged[args.backend] = rec
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
