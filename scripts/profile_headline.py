"""Per-op device profile of the headline program (round 4).

Captures a jax.profiler device trace of the EXACT bench program (one
scanned batch-4 pair iteration) and aggregates the "XLA Ops" timeline by
fusion name, printing a ranked cost table — the authoritative in-model
ledger (isolated-op slope probes disagree with in-model costs because
XLA fuses across stage boundaries).

  python scripts/profile_headline.py [--top 40] [--iters 8]
"""
import argparse
import collections
import glob
import os
import sys
import tempfile
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

BATCH, H, W, K = 4, 480, 640, 1024


def aggregate_xla_ops(trace_dir):
    """Sum device-time per XLA op FAMILY from the xplane trace.

    Leaf events only (the outer while/scan op spans its body and would
    double-count). Family key = op kind with instance numbers stripped
    + output type/shape, so the 36 per-GNN-layer clones aggregate."""
    import re

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    sp = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        sp.ParseFromString(f.read())
    per_op = collections.Counter()
    counts = collections.Counter()
    total_ps = 0
    for plane in sp.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                if name.startswith("%while") or name.startswith("while"):
                    continue  # spans its body; leaves are counted below
                lhs = name.split(" = ")[0] if " = " in name else name
                rhs = name.split(" = ", 1)[1] if " = " in name else ""
                shape = rhs.split(" ")[0].split("{")[0]
                kind = re.sub(r"[.\d]+$", "", lhs.lstrip("%"))
                key = f"{kind:34s} {shape}"
                per_op[key] += ev.duration_ps
                counts[key] += 1
                total_ps += ev.duration_ps
    return per_op, counts, total_ps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from image_matching_tpu.models.matching import Matching, MatchingConfig

    cfg = MatchingConfig(
        backbone="bn", descriptor_dim=256, max_keypoints=K,
        keypoint_threshold=0.005, gnn_layers=18, sinkhorn_iterations=30,
        match_threshold=0.1, compute_dtype="bfloat16",
    )
    model = Matching(cfg)
    rng = np.random.default_rng(0)
    s0 = jnp.asarray(rng.uniform(0, 1, (args.iters, BATCH, H, W, 1)).astype(np.float32))
    s1 = jnp.asarray(rng.uniform(0, 1, (args.iters, BATCH, H, W, 1)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), s0[0][:1], s1[0][:1])

    @jax.jit
    def run(variables, s0, s1):
        def body(c, pair):
            out = model.apply(variables, pair[0], pair[1])
            return c + jnp.sum(out["matching_scores0"]), None
        tot, _ = jax.lax.scan(body, jnp.zeros(()), (s0, s1))
        return tot

    print("compiling + warming...", flush=True)
    float(run(variables, s0, s1))  # compile + warm
    print("tracing...", flush=True)
    tdir = tempfile.mkdtemp(prefix="headline_trace_")
    jax.profiler.start_trace(tdir)
    float(run(variables, s0, s1))
    jax.profiler.stop_trace()
    print("parsing trace...", flush=True)

    per_op, counts, total_ps = aggregate_xla_ops(tdir)
    n = args.iters
    print(f"device total (leaf ops): {total_ps / 1e9 / n:.3f} ms/batch{BATCH} "
          f"({len(per_op)} op families, {n} iters)")
    print(f"{'ms/batch':>9s}  {'%':>5s}  {'n':>4s}  op family")
    for name, ps in per_op.most_common(args.top):
        print(f"{ps / 1e9 / n:9.3f}  {100 * ps / total_ps:5.1f}  "
              f"{counts[name] // n:4d}  {name[:120]}")


if __name__ == "__main__":
    main()
