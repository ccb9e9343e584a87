"""Benchmark: VEON-B 6-camera frames/sec/chip, full inference graph.

Protocol mirrors the reference FPS harness (`tools/analysis_tools/
benchmark.py:73-96`: fps = n / sum(pure inference time) with warmup), made
robust to this box's tunneled backend: the host<->device round trip is both
slow (~25 ms) and variable (up to ~50 ms), so the timed loop runs ON DEVICE
— a lax.scan over N full forwards with per-iteration input perturbation
(defeats loop-invariant hoisting/CSE) and a single scalar readback.
Prints ONE JSON line.

Baseline: BASELINE.json north star = 25 six-camera frames/sec/chip on v5e.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_ITERS = 10


def _wait_for_claim(budget_s: float = 600.0):
    """The chip is time-shared and a dead native session can wedge its claim
    for up to that session's claim_timeout (observed round 4); probe with a
    trivial op until claimable so a transient wedge doesn't turn the round's
    benchmark into a spurious failure."""
    import subprocess

    t0 = time.perf_counter()
    probe = ("import jax, jax.numpy as jnp; "
             "print(float((jnp.ones((2,))+1).sum()))")
    while True:
        left = budget_s - (time.perf_counter() - t0)
        if left <= 0:
            print("bench: claim probe budget exhausted; proceeding anyway",
                  file=sys.stderr)
            return
        try:
            subprocess.run([sys.executable, "-c", probe], check=True,
                           timeout=min(180.0, left), capture_output=True)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            print(f"bench: chip not claimable yet "
                  f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)
            time.sleep(20)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, args = entry()
    params, imgs, depth_imgs, metas, ovw = args
    eps = jnp.linspace(0.0, 1e-3, N_ITERS)

    @jax.jit
    def many(params, imgs, depth_imgs, metas, ovw):
        def body(c, e):
            out = fn(params, imgs + e, depth_imgs + e, metas, ovw)
            return c + out.sum(), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), eps)
        return c

    @jax.jit
    def once(params, imgs, depth_imgs, metas, ovw):
        return fn(params, imgs, depth_imgs, metas, ovw).sum()

    t0 = time.perf_counter()
    float(once(params, imgs, depth_imgs, metas, ovw))
    compile_s = time.perf_counter() - t0
    float(many(params, imgs, depth_imgs, metas, ovw))  # compile scan variant

    # timed: K outer calls of the N-iteration device loop; per-frame time is
    # the median outer time divided by N (tunnel cost amortized to <10%)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(params, imgs, depth_imgs, metas, ovw))
        times.append(time.perf_counter() - t0)
    per_frame = sorted(times)[1] / N_ITERS
    fps = 1.0 / per_frame

    detail = {
        "ms_per_frame": round(per_frame * 1e3, 2),
        "device_loop_iters": N_ITERS,
        "compile_s": round(compile_s, 1),
    }
    # fp32 fidelity row, SAME RUN (BASELINE.md "fp32 fidelity" anchor): the
    # bf16 headline must be accompanied by the full-precision number so the
    # precision/speed trade stays visible. Skippable if the driver's wall
    # budget ever tightens (VEON_BENCH_FP32=0).
    if os.environ.get("VEON_BENCH_FP32", "1") != "0":
        try:
            fp32 = _measure_fp32()
            detail["fp32_fps"] = round(fp32["fps"], 3)
            detail["fp32_ms_per_frame"] = round(fp32["ms"], 2)
        except Exception as e:  # never lose the headline to the extra row
            detail["fp32_error"] = repr(e)[:200]

    print(json.dumps({
        "metric": "veon_b_6cam_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 25.0, 4),
        "detail": detail,
    }))


def _measure_fp32(iters: int = 6):
    """Same-run fp32 full-graph measurement (round-1's 4.99 fps was from a
    different process — chip time-sharing makes cross-run numbers
    incomparable, NOTES.md 'trust only same-run A/B')."""
    import jax
    import jax.numpy as jnp

    os.environ["VEON_ENTRY_DTYPE"] = "float32"
    from __graft_entry__ import entry

    fn, args = entry()
    params, imgs, depth_imgs, metas, ovw = args
    eps = jnp.linspace(0.0, 1e-3, iters)

    @jax.jit
    def many(params, imgs, depth_imgs, metas, ovw):
        def body(c, e):
            out = fn(params, imgs + e, depth_imgs + e, metas, ovw)
            return c + out.sum(), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), eps)
        return c

    float(many(params, imgs, depth_imgs, metas, ovw))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(params, imgs, depth_imgs, metas, ovw))
        times.append(time.perf_counter() - t0)
    ms = sorted(times)[1] / iters * 1e3
    return {"fps": 1000.0 / ms, "ms": ms}


if __name__ == "__main__":
    # probe in a SUBPROCESS before this process touches jax: the probe's
    # claim releases on its exit, then the benchmark claims cleanly
    _wait_for_claim()
    main()
