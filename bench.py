"""Benchmark: VEON-B 6-camera frames/sec/chip, full inference graph.

Protocol mirrors the reference FPS harness (`tools/analysis_tools/
benchmark.py:73-96`: fps = n / sum(pure inference time) with warmup), adapted
for the tunneled TPU backend on this box: `block_until_ready` does not block
here, so timing forces a scalar host readback per iteration and we subtract
the measured null round-trip. Prints ONE JSON line.

Baseline: BASELINE.json north star = 25 six-camera frames/sec/chip on v5e.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, args = entry()

    step = jax.jit(lambda *a: fn(*a).sum())

    # warmup / compile
    t0 = time.perf_counter()
    float(step(*args))
    compile_s = time.perf_counter() - t0
    for _ in range(3):
        float(step(*args))

    # measure null round-trip to subtract tunnel/dispatch overhead
    null = jax.jit(lambda x: x.sum())
    x0 = jnp.ones((8, 8))
    float(null(x0))
    t0 = time.perf_counter()
    for _ in range(10):
        float(null(x0))
    null_s = (time.perf_counter() - t0) / 10

    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        float(step(*args))
    total = time.perf_counter() - t0
    per_iter = max(total / n - null_s, 1e-9)
    fps = 1.0 / per_iter

    print(json.dumps({
        "metric": "veon_b_6cam_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 25.0, 4),
        "detail": {
            "ms_per_frame": round(per_iter * 1e3, 2),
            "null_roundtrip_ms": round(null_s * 1e3, 2),
            "compile_s": round(compile_s, 1),
        },
    }))


if __name__ == "__main__":
    main()
