"""TPU quality gate: run before every perf commit (VERDICT round-4 item 2).

The round-3/4 H-layout regression shipped because nothing on the chip
asserted end-to-end registration quality: the defect was a TPU-backend
jit miscompile of `realign_h`'s shifted-slice concat (the compiled
program dropped the +1 row shift), invisible to the f32 CPU test suite
by construction. This gate closes that hole with two layers:

  A. op exactness — every s2d-layout op is compared jit-vs-eager ON THE
     CURRENT BACKEND at model shapes (eager dispatches one XLA op at a
     time and was correct even when the fused jit program was not);
  B. end-to-end quality — the reference eval regime (480x640, K=1200,
     det 0.005, RANSAC 7, banked weights, 12 pairs, seed 0) must meet
     absolute corner-error bars with DEFAULT flags, and the default
     fast layout must match the plain conv path.

Exit code 0 = ship; nonzero = a perf "win" broke the product. Banks
artifacts/tpu_quality_gate.json either way.

Usage:  python scripts/tpu_quality_gate.py [--fast]   (--fast = part A only)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Gate bars (VERDICT round-4 item 1 "done" criteria).
SP_MAX_PX = 0.60
SPSG_MAX_PX = 0.70
LAYOUT_DELTA_MAX_PX = 0.15
MIN_MATCHES = 400


def part_a_op_exactness() -> dict:
    import jax
    import jax.numpy as jnp
    from image_matching_tpu.ops import s2d_conv as s2d

    rng = np.random.default_rng(0)
    results = {}
    ok = True

    def check(name, fn, *args, tol=0.0):
        nonlocal ok
        eager = np.asarray(fn(*args), np.float32)
        jitted = np.asarray(jax.jit(fn)(*args), np.float32)
        d = float(np.abs(eager - jitted).max())
        results[name] = d
        status = "ok" if d <= tol else "FAIL"
        if d > tol:
            ok = False
        print(f"  {name:42s} max|jit-eager|={d:.6f} [{status}]")

    for dt in (jnp.float32, jnp.bfloat16):
        tag = dt.__name__
        uh = jnp.asarray(rng.standard_normal((2, 241, 640, 128)), dt)
        u4 = jnp.asarray(rng.standard_normal((2, 121, 321, 256)), dt)
        xh = jnp.asarray(rng.standard_normal((2, 240, 640, 128)), dt)
        x4 = jnp.asarray(rng.standard_normal((2, 120, 320, 256)), dt)
        img = jnp.asarray(rng.standard_normal((2, 480, 640, 1)), dt)
        k1 = jnp.asarray(rng.standard_normal((3, 3, 1, 64)) * 0.2, jnp.float32)
        kr = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.float32)

        check(f"realign_h[{tag}]", s2d.realign_h, uh)
        check(f"realign_2x2[{tag}]", s2d.realign, u4)
        check(f"pool_h_from_raw[{tag}]", s2d.maxpool2x2_s2dh_from_raw, uh)
        check(f"pool_2x2_from_raw[{tag}]", s2d.maxpool2x2_s2d_from_raw, u4)
        check(f"entry_h_ci1[{tag}]",
              lambda x, k: s2d.conv3x3_s2dh_entry(x, k.astype(x.dtype)),
              img, k1)
        check(f"raw_h+realign[{tag}]",
              lambda x, k: s2d.realign_h(
                  s2d.conv3x3_s2dh_raw(x, k.astype(x.dtype))),
              xh, kr)
        check(f"raw_2x2+realign[{tag}]",
              lambda x, k: s2d.realign(
                  s2d.conv3x3_s2d_raw(x, k.astype(x.dtype))),
              x4, jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05,
                              jnp.float32))

    # Pallas entry kernel vs its XLA reference on the real backend.
    from image_matching_tpu.ops.pallas import entry_h as eh
    import jax.numpy as jnp
    imgs = jnp.asarray(rng.standard_normal((2, 480, 640)), jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 128), jnp.float32)
    shift = jnp.asarray(rng.uniform(-0.5, 0.5, 128), jnp.float32)
    ref = np.asarray(jax.jit(eh._xla_reference)(imgs, k1, scale, shift),
                     np.float32)
    got = np.asarray(jax.jit(eh.entry_h_fused)(imgs, k1, scale, shift),
                     np.float32)
    d = float(np.abs(got - ref).max())
    rel = d / max(float(np.abs(ref).max()), 1e-6)
    results["pallas_entry_h_vs_xla"] = d
    print(f"  {'pallas_entry_h_vs_xla':42s} max|d|={d:.6f} rel={rel:.6f} "
          f"[{'ok' if rel <= 0.02 else 'FAIL'}]")
    if rel > 0.02:
        ok = False
    return {"ok": ok, "diffs": results}


def _run_eval(out_path: str, extra: list[str]) -> dict:
    cmd = [
        sys.executable, "-m", "image_matching_tpu.cli.evaluate",
        "--n_pairs", "12", "--seed", "0",
        "--sp_checkpoint", "weights/sp_photo.npz",
        "--out", out_path,
    ] + extra
    subprocess.run(cmd, check=True, cwd=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    with open(out_path) as f:
        return json.load(f)


def part_b_quality() -> dict:
    res_default = _run_eval("/tmp/gate_default.json", [
        "--configs", "sp", "spsg",
        "--sg_checkpoint", "weights/sg_photo.npz",
    ])
    res_off = _run_eval("/tmp/gate_off.json", [
        "--configs", "sp", "--s2d_backbone", "off",
    ])
    sp = res_default["sp"]["mean_corner_err_px"]
    spsg = res_default["spsg"]["mean_corner_err_px"]
    sp_off = res_off["sp"]["mean_corner_err_px"]
    sp_matches = res_default["sp"]["mean_matches"]
    checks = {
        f"sp<= {SP_MAX_PX}": sp <= SP_MAX_PX,
        f"spsg<= {SPSG_MAX_PX}": spsg <= SPSG_MAX_PX,
        f"|sp-sp_off|<= {LAYOUT_DELTA_MAX_PX}":
            abs(sp - sp_off) <= LAYOUT_DELTA_MAX_PX,
        f"sp_matches>= {MIN_MATCHES}": sp_matches >= MIN_MATCHES,
        "success==1": res_default["sp"]["success_rate"] == 1.0
                      and res_default["spsg"]["success_rate"] == 1.0,
    }
    for name, passed in checks.items():
        print(f"  {name:28s} [{'ok' if passed else 'FAIL'}]")
    return {
        "ok": all(checks.values()),
        "sp_px": sp, "spsg_px": spsg, "sp_off_px": sp_off,
        "sp_matches": sp_matches,
        "spsg_matches": res_default["spsg"]["mean_matches"],
        "checks": {k: bool(v) for k, v in checks.items()},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="op-exactness layer only (~20 s)")
    args = ap.parse_args()

    import jax
    backend = jax.default_backend()
    print(f"TPU quality gate on backend={backend}")
    if backend != "tpu":
        print("WARNING: not on TPU — the gate exists to catch "
              "TPU-backend-only defects; results are advisory here.")

    print("Part A: s2d op jit-vs-eager exactness")
    a = part_a_op_exactness()
    report = {"backend": backend, "part_a": a}
    if not args.fast:
        print("Part B: reference-regime end-to-end quality")
        b = part_b_quality()
        report["part_b"] = b
        ok = a["ok"] and b["ok"]
    else:
        ok = a["ok"]
    report["ok"] = ok

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/tpu_quality_gate.json", "w") as f:
        json.dump(report, f, indent=2)
    print(f"GATE {'PASS' if ok else 'FAIL'} — "
          "banked artifacts/tpu_quality_gate.json")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
