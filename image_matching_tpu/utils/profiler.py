"""Profiling helpers: jax.profiler traces + simple roofline accounting.

The reference's only instrumentation is wall-clock prints
(traditional.py:29-39, superpoint_glue_test.py:77-95); SURVEY.md §5 makes
device tracing a first-class deliverable here.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

from image_matching_tpu.utils.logging import get_logger

log = get_logger(__name__)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profile trace written to %s", logdir)


@contextlib.contextmanager
def timed(name: str, sync: bool = True) -> Iterator[None]:
    t0 = time.perf_counter()
    yield
    if sync:
        # note: through remote-execution relays block_until_ready may
        # under-report; prefer reading a scalar back (see bench.py)
        pass
    log.info("%s: %.3f ms", name, (time.perf_counter() - t0) * 1e3)


def flops_estimate_matching(
    height: int, width: int, n_kpts: int, d: int = 256, layers: int = 18
) -> float:
    """Rough FLOPs for one SP+SG pair — for roofline sanity checks."""
    hw = height * width
    backbone = 2 * hw * 9 * (64 * 1 + 64 * 64) + 2 * (hw / 4) * 9 * 64 * 64
    backbone += 2 * (hw / 16) * 9 * (64 * 128 + 128 * 128)
    backbone += 2 * (hw / 64) * 9 * (128 * 128 * 2 + 128 * 256)
    heads = 2 * (hw / 64) * (256 * 65 + 256 * d)
    proj = layers * 2 * 4 * n_kpts * d * d * 2
    attn = layers * 2 * 2 * n_kpts * n_kpts * d * 2
    mlp = layers * 2 * 2 * n_kpts * (2 * d) * (2 * d) * 2
    return 2 * (backbone + heads) + proj + attn + mlp
