"""Profiling / analysis tooling.

Covers the reference's analysis surface (`tools/analysis_tools/`):
  benchmark.py      -> bench.py + cli benchmark (fps protocol)
  benchmark_view_transformer.py -> lift_microbench() below
  get_flops.py      -> flops() via jax cost analysis
plus jax.profiler trace capture (the reference has no tracer; mmcv only
logs per-iter timings).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/veon_trace"):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def flops(fn: Callable, *args) -> Dict[str, float]:
    """XLA cost analysis of a jittable function (get_flops equivalent)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
    }


def fps_harness(step: Callable[[], float], n_iters: int = 50, warmup: int = 5,
                subtract_overhead: bool = True) -> Dict[str, float]:
    """FPS = n / sum(pure inference time) (benchmark.py:73-96 protocol).

    `step` must force a host readback (block_until_ready does not block on
    tunneled backends — see .claude/skills/verify/SKILL.md).
    """
    for _ in range(warmup):
        step()
    overhead = 0.0
    if subtract_overhead:
        import jax.numpy as jnp

        null = jax.jit(lambda x: x.sum())
        x0 = jnp.ones((8, 8))
        float(null(x0))
        t0 = time.perf_counter()
        for _ in range(10):
            float(null(x0))
        overhead = (time.perf_counter() - t0) / 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        step()
    per = max((time.perf_counter() - t0) / n_iters - overhead, 1e-9)
    return {"fps": 1.0 / per, "ms_per_iter": per * 1e3, "overhead_ms": overhead * 1e3}


def lift_microbench(n_iters: int = 10) -> Dict[str, float]:
    """LSS lift micro-benchmark at production VEON-B shapes
    (benchmark_view_transformer equivalent)."""
    import jax.numpy as jnp

    from ..configs.base import GridConfig
    from ..lift.lss import LSSLift, two_hot_depth

    grid = GridConfig()
    lift = LSSLift(grid=grid, input_size=(512, 1408), downsample=16,
                   out_channels=256, ds_feat=(2, 2, 2))
    B, N, h, w = 1, 6, 32, 88
    rng = np.random.default_rng(0)
    s2e = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for i in range(N):
        th = i * np.pi / 3
        s2e[0, i, :3, :3] = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
            np.float32)
    K = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    K[..., 0, 0] = K[..., 1, 1] = 780.0
    K[..., 0, 2] = 704.0
    K[..., 1, 2] = 256.0
    metas = [jnp.asarray(s2e), jnp.asarray(K),
             jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))),
             jnp.zeros((B, N, 3)), jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))]
    feat = jnp.asarray(rng.standard_normal((B, N, h, w, 256)).astype(np.float32))
    metric = jnp.asarray(rng.uniform(1, 44, size=(B, N, h, w)).astype(np.float32))

    @jax.jit
    def run(feat, metric):
        return lift(feat, two_hot_depth(metric, grid), *metas).sum()

    return fps_harness(lambda: float(run(feat, metric)), n_iters=n_iters)
