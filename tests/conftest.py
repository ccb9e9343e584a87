"""Test configuration: run everything on an 8-device virtual CPU mesh.

The image's sitecustomize pre-imports jax and registers the axon TPU
backend, so env vars alone don't steer platform selection — use
jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_backend_optimization_level" not in flags:
    # tests are compile-bound on the single CPU core; O0 cuts the heavy
    # model-graph compiles ~5x (131 s -> 26 s measured) without touching
    # numerics-sensitive paths (tolerance-based oracles still pass)
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compilation cache for the CPU suite: the wall time is
# dominated by ~a dozen distinct full-graph compiles on the single core;
# warm re-runs load them from disk (~2.6x faster compiles measured:
# tiny init 11.1 -> 4.2 s, apply 7.9 -> 2.9 s). Cache hits deserialize
# AOT results with a benign machine-feature E-log (same box; the
# "prefer-no-scatter/gather" entries are tuning prefs, not CPU features)
# — pytest captures stderr, so passing runs stay quiet. NOTE: this is the
# LOCAL CPU cache only; the remote TPU compile relay measures WORSE with
# a persistent cache (NOTES.md) and is untouched here.
if not os.environ.get("VEON_TESTS_NO_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/veon_tpu_xla_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import functools  # noqa: E402

import pytest  # noqa: E402


@functools.lru_cache(maxsize=None)
def _tiny_graph(num_temporal):
    """Build-once cache of the tiny full graph per num_temporal: the suite is
    compile-bound on one CPU core, and several files need the same
    (cfg, model, params, inputs, outputs) tuple — sharing the init + apply
    compile across tests is the round-3 wall-time budget (VERDICT #9)."""
    import numpy as np
    import jax.numpy as jnp

    from veon_tpu.configs import presets
    from veon_tpu.model.veon import VeonModel
    from veon_tpu.nn import text as text_mod

    from tests.test_model_graph import _metas

    cfg = presets.veon_tiny_test(num_temporal=num_temporal)
    rng = np.random.default_rng(0)
    B, F, N = 1, num_temporal, 6
    H, W = cfg.data.input_size
    imgs = jnp.asarray(rng.standard_normal((B, F, N, H, W, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(1.0, 40.0, size=(B, F, N, H // 2, W // 2)).astype(np.float32))
    metas = _metas(B, F, N, rng)
    prompts, refl = text_mod.build_vocabulary()
    ovw = jnp.asarray(
        rng.standard_normal((len(prompts) + 1, cfg.san.clip_embed_dim)).astype(np.float32))
    model = VeonModel(cfg=cfg)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), imgs, depth, metas, ovw, train=False)
    out = jax.jit(model.apply, static_argnames=("train",))(
        params, imgs, depth, metas, ovw, train=False)
    return dict(cfg=cfg, refl=refl, model=model, params=params, imgs=imgs,
                depth=depth, metas=metas, ovw=ovw, out=out)


@pytest.fixture(scope="session")
def tiny_graph():
    """Session-scoped accessor: tiny_graph(num_temporal) -> shared dict."""
    return _tiny_graph
