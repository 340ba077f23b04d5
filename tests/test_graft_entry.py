"""Regression tests for the driver entry points (subprocess-isolated so
the platform override logic runs from a clean interpreter)."""
import subprocess
import sys

import numpy as np
import pytest


class TestDryrunMultichip:
    @pytest.mark.parametrize("n", [4, 8])
    def test_dryrun(self, n):
        proc = subprocess.run(
            [sys.executable, "__graft_entry__.py", "dryrun", str(n)],
            capture_output=True, text=True, timeout=500,
            cwd="/root/repo",
            env={
                "PATH": "/usr/bin:/bin:/usr/local/bin",
                "HOME": "/root",
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": f"--xla_force_host_platform_device_count={n}",
                "PYTHONPATH": "/root/repo",
            },
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "dryrun_multichip OK" in proc.stdout


class TestViz:
    def test_draw_tracks(self):
        from image_matching_tpu.utils.viz import draw_tracks

        img = np.random.default_rng(0).uniform(0, 1, (64, 64, 1)).astype(np.float32)
        tracks = [(0, [(0, 10.0, 10.0), (1, 14.0, 12.0)]),
                  (7, [(0, 30.0, 40.0), (1, 33.0, 38.0), (2, 36.0, 36.0)])]
        out = draw_tracks(img, tracks)
        assert out.shape == (64, 64, 3)
        assert out.dtype == np.uint8
