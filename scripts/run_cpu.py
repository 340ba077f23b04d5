"""Run an image_matching_tpu CLI module on the virtual CPU mesh.

The environment's sitecustomize imports jax at interpreter startup and
registers the TPU plugin, so JAX_PLATFORMS=cpu in the environment is too
late — the platform must be flipped via jax.config before any backend
work (see .claude/skills/verify/SKILL.md). Usage:

  python scripts/run_cpu.py [--devices N] <module> [args...]

e.g.
  python scripts/run_cpu.py --devices 8 image_matching_tpu.cli.train_superpoint \
      --synthetic --run_dir runs/sp_synth_cpu --resume
"""
import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

argv = sys.argv[1:]
devices = 8
if argv and argv[0] == "--devices":
    devices = int(argv[1])
    argv = argv[2:]

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={devices}"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

module, sys.argv = argv[0], argv
runpy.run_module(module, run_name="__main__")
