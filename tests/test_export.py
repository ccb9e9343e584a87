"""jax.export round-trip on a small jitted function (deployment export)."""

import numpy as np
import jax
import jax.numpy as jnp

from veon_tpu.utils.export import export_inference, load_inference


def test_export_roundtrip(tmp_path):
    def fn(x, w):
        return jnp.tanh(x @ w).sum(axis=-1)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32))
    w = jnp.asarray(np.random.default_rng(1).standard_normal((8, 3)).astype(np.float32))
    p = export_inference(fn, (x, w), str(tmp_path / "fn.stablehlo"))
    loaded = load_inference(p)
    np.testing.assert_allclose(np.asarray(loaded(x, w)), np.asarray(fn(x, w)), rtol=1e-6)
