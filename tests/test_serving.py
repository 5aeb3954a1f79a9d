"""Serving export: serialize predict_y to a StableHLO artifact, reload,
and compare against the live model."""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu import DGP, Gaussian, RBF
from doubly_stochastic_dgp_tpu.serving import (export_predict_y,
                                               load_exported)


def test_export_roundtrip(tmp_path):
    np.random.seed(0)
    X = np.random.rand(16, 2)
    Y = np.random.randn(16, 1)
    Z = X[:6].copy()
    m = DGP.build(X, Y, Z, [RBF.make(2), RBF.make(2)], Gaussian.make(0.1),
                  num_samples=2)

    path = str(tmp_path / "predict.stablehlo")
    export_predict_y(m, batch_size=5, S=3, path=path)
    served = load_exported(path)

    x = jnp.asarray(np.random.rand(5, 2))
    key = jax.random.PRNGKey(7)
    mean_live, var_live = m.predict_y(x, S=3, key=key)
    mean_srv, var_srv = served(m, x, key)
    assert_allclose(np.asarray(mean_srv), np.asarray(mean_live),
                    rtol=1e-6, atol=1e-9)
    assert_allclose(np.asarray(var_srv), np.asarray(var_live),
                    rtol=1e-6, atol=1e-9)

    # the artifact accepts updated parameters (serving after retraining)
    m2 = m.replace(likelihood=Gaussian.make(0.5))
    mean2_live, var2_live = m2.predict_y(x, S=3, key=key)
    mean2_srv, var2_srv = served(m2, x, key)
    assert_allclose(np.asarray(var2_srv), np.asarray(var2_live),
                    rtol=1e-6, atol=1e-9)
    assert not np.allclose(np.asarray(var2_srv), np.asarray(var_srv))


def test_export_predict_y_damianou_roundtrip():
    """The export surface must cover the collapsed Damianou model too
    (prediction propagates through per-layer collapsed posteriors)."""
    import numpy as np
    import jax
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.serving import (export_predict_y,
                                                   load_exported)

    rng = np.random.RandomState(0)
    X = rng.randn(40, 2)
    Y = np.sin(X[:, :1]) + 0.05 * rng.randn(40, 1)
    m = dsd.DGPDamianou.build(X, Y, X[:8].copy(),
                              [dsd.RBF.make(2), dsd.RBF.make(2)],
                              dsd.Gaussian.make(0.05))
    art = export_predict_y(m, batch_size=10, S=4)
    fn = load_exported(art)
    mu, v = fn(m, jax.numpy.asarray(X[:10]), jax.random.PRNGKey(0))
    mu_d, v_d = m.predict_y(jax.numpy.asarray(X[:10]), S=4,
                            key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_d),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_d),
                               rtol=1e-6, atol=1e-8)


def test_artifact_callable_in_fresh_process():
    """Cross-process serving: a chol/tsolve-containing artifact called
    in a FRESH interpreter (the deployment scenario) must reproduce
    the exporting process's outputs bitwise.  Regression for the jax
    0.9.0 CPU segfault cured by load_exported's LAPACK warmup."""
    import os
    import subprocess
    import sys
    import tempfile

    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from doubly_stochastic_dgp_tpu.serving import export_fn, load_exported

    def fn(x):
        L = jnp.linalg.cholesky(x @ x.T + 2.0 * jnp.eye(4))
        return jax.scipy.linalg.solve_triangular(L, x[:, :1], lower=True)

    x = jnp.asarray(np.random.RandomState(0).randn(4, 4))
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "f.bin")
        export_fn(fn, x, path=path)
        ref = np.asarray(load_exported(path)(x))
        np.save(os.path.join(td, "x.npy"), np.asarray(x))
        code = (
            "import sys\n"
            f"sys.path.insert(0, {repo!r})\n"
            "import numpy as np, jax.numpy as jnp\n"
            "from doubly_stochastic_dgp_tpu.serving import load_exported\n"
            f"serve = load_exported({path!r})\n"
            f"x = jnp.asarray(np.load({os.path.join(td, 'x.npy')!r}))\n"
            f"np.save({os.path.join(td, 'o.npy')!r}, np.asarray(serve(x)))\n")
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="",
                   JAX_PLATFORMS="cpu", JAX_ENABLE_X64="1")
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, env=env,
                             timeout=300)
        assert out.returncode == 0, (out.returncode, out.stderr[-2000:])
        served = np.load(os.path.join(td, "o.npy"))
        assert np.array_equal(served, ref)


def test_make_server_matches_cached_predict():
    """make_server (round-4 PERF.md serving verdict shipped as API):
    the closure-jitted production path must agree with the cached
    posterior driven through the generic arg-passed jit."""
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu import make_server, precompute

    rng = np.random.RandomState(0)
    X = rng.randn(48, 3)
    Y = rng.randn(48, 1)
    m = DGP.build(X, Y, X[:8].copy(), [RBF.make(3), RBF.make(3)],
                  Gaussian.make(0.1), num_samples=2)

    key = jax.random.PRNGKey(7)
    serve = make_server(m, S=3, warmup_batch=4)
    mean_s, var_s = serve(X[:10], key=key)

    post = precompute(m)
    mean_r, var_r = jax.jit(
        lambda mm, x, k: mm.predict_y(x, S=3, key=k))(
            post, jnp.asarray(X[:10]), key)
    assert_allclose(np.asarray(mean_s), np.asarray(mean_r),
                    rtol=1e-12, atol=1e-12)
    assert_allclose(np.asarray(var_s), np.asarray(var_r),
                    rtol=1e-12, atol=1e-12)

    # fixed key reproducible; auto keys advance (unique dispatches)
    again = serve(X[:10], key=key)
    assert np.array_equal(np.asarray(again[1]), np.asarray(var_s))
    a = serve(X[:10])
    b = serve(X[:10])
    assert not np.array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_make_server_predict_density_and_live():
    """predict_density servers need Y; precompute=False serves the raw
    (live-conditional) model."""
    from doubly_stochastic_dgp_tpu import make_server

    rng = np.random.RandomState(1)
    X = rng.randn(32, 2)
    Y = rng.randn(32, 1)
    m = DGP.build(X, Y, X[:6].copy(), [RBF.make(2)], Gaussian.make(0.1),
                  num_samples=2)

    key = jax.random.PRNGKey(3)
    serve_d = make_server(m, S=4, method="predict_density")
    d = serve_d(X[:5], Y[:5], key=key)
    ref = m.predict_density(jnp.asarray(X[:5]), jnp.asarray(Y[:5]),
                            S=4, key=key)
    assert_allclose(np.asarray(d), np.asarray(ref), rtol=1e-9)

    import pytest
    with pytest.raises(ValueError, match="need Y"):
        serve_d(X[:5])

    serve_live = make_server(m, S=4, precompute=False)
    mean_l, _ = serve_live(X[:5], key=key)
    mean_m, _ = m.predict_y(jnp.asarray(X[:5]), S=4, key=key)
    assert_allclose(np.asarray(mean_l), np.asarray(mean_m), rtol=1e-9,
                    atol=1e-12)


def test_make_server_batch_buckets():
    """Bucketed serving: ragged batches are padded to the bucket (per-
    row predictions are independent, so kept rows match the full-batch
    call to roundoff on deterministic models) and oversize batches are
    served in top-bucket chunks."""
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu import make_server

    rng = np.random.RandomState(0)
    X = rng.randn(40, 2)
    Y = np.sin(X[:, :1]) + 0.05 * rng.randn(40, 1)
    m = dsd.GPR.build(X, Y, dsd.RBF.make(2), noise_variance=0.05)

    serve = make_server(m, S=1, batch_buckets=(4, 8))
    ref = make_server(m, S=1)

    # ragged request inside a bucket: rows bitwise vs the plain server
    for B in (3, 4, 6, 8):
        mean_b, var_b = serve(X[:B])
        mean_r, var_r = ref(X[:B])
        assert mean_b.shape == mean_r.shape
        # per-row predictions are independent of the padding rows;
        # ulp-level differences remain (CPU matmul tail handling
        # differs between column-tile widths), so tight-allclose
        assert_allclose(np.asarray(mean_b), np.asarray(mean_r),
                        rtol=1e-10, atol=1e-12)
        assert_allclose(np.asarray(var_b), np.asarray(var_r),
                        rtol=1e-10, atol=1e-12)

    # oversize request: chunked over the top bucket and concatenated
    mean_c, var_c = serve(X[:19])
    mean_f, var_f = ref(X[:19])
    assert mean_c.shape == mean_f.shape
    assert_allclose(np.asarray(mean_c), np.asarray(mean_f),
                    rtol=1e-10, atol=1e-12)

    # density servers bucket too (row axis of the (B, D) output)
    sd = make_server(m, S=1, method="predict_density",
                     batch_buckets=(8,))
    rd = make_server(m, S=1, method="predict_density")
    d_b = sd(X[:5], Y[:5])
    d_r = rd(X[:5], Y[:5])
    assert d_b.shape == d_r.shape
    assert_allclose(np.asarray(d_b), np.asarray(d_r),
                    rtol=1e-10, atol=1e-12)

    # MC models: shapes/finiteness through the bucketed path
    dgp = dsd.DGP.build(X, Y, X[:6].copy(), [dsd.RBF.make(2)],
                        dsd.Gaussian.make(0.1), num_samples=2)
    sm = make_server(dgp, S=3, batch_buckets=(8,))
    mean, var = sm(X[:19])
    assert mean.shape[-2] == 19
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(var) > 0)


def test_make_server_heteroscedastic_head_preserved():
    """make_server on DGPHeteroscedastic: the posterior cache maps the
    SVGP layers in place and KEEPS the model class, so the custom
    (mean, log-noise)-head y-space moments survive the cached path."""
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu import init_layers_linear, make_server

    rng = np.random.RandomState(0)
    X = rng.randn(40, 2)
    Y = np.sin(X[:, :1]) + 0.05 * rng.randn(40, 1)
    layers = init_layers_linear(X, Y, X[:8].copy(),
                                [dsd.RBF.make(2), dsd.RBF.make(2)],
                                num_outputs=2)
    m = dsd.DGPHeteroscedastic.make(X, Y, dsd.Gaussian.make(0.05),
                                    layers, num_samples=3)
    key = jax.random.PRNGKey(0)
    serve = make_server(m, S=3)
    mean_s, var_s = serve(X[:5], key=key)
    mean_l, var_l = m.predict_y(jnp.asarray(X[:5]), S=3, key=key)
    assert_allclose(np.asarray(mean_s), np.asarray(mean_l), rtol=1e-8,
                    atol=1e-10)
    # variance: cached staged (sum-of-squares) form vs live — roundoff
    assert_allclose(np.asarray(var_s), np.asarray(var_l), rtol=1e-5,
                    atol=1e-8)
    # and the noise head is actually in the moments: var exceeds a
    # homoscedastic floor and varies across inputs
    assert float(np.std(np.asarray(var_s))) > 0
