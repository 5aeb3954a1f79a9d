"""Dynamic-S prediction (autoflow parity, round-2 VERDICT missing #4):
the reference passes num_samples at call time through one compiled graph
(reference dgp.py:100-126); DynamicPredictor restores that under jit via
S-bucketing — one compile services every S within a bucket.

Oracles: the trace counter (compile count), exact equality against the
plain methods for single-layer models (deterministic conditional
moments, so the kept-sample semantics coincide bitwise), and shape/
chunking checks for deep stacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

import doubly_stochastic_dgp_tpu as dsd
from doubly_stochastic_dgp_tpu import DynamicPredictor


def _model(L=2, N=24, S=3):
    rng = np.random.RandomState(0)
    X = rng.randn(N, 2)
    Y = np.sin(X[:, :1]) + 0.05 * rng.randn(N, 1)
    Z = X[:8].copy()
    kerns = [dsd.RBF.make(2) for _ in range(L)]
    m = dsd.DGP.build(X, Y, Z, kerns, dsd.Gaussian.make(0.05),
                      num_samples=S)
    # non-trivial q_mu so per-sample means actually vary
    layers = [l.replace(q_mu=l.q_mu.with_value(
        rng.randn(*l.q_mu.value.shape) * 0.4)) for l in m.layers]
    return m.replace(layers=layers), X, Y


def test_one_compile_services_every_S_in_bucket():
    m, X, Y = _model()
    p = DynamicPredictor(m, buckets=(100,))
    for S in (1, 5, 25, 100):   # the reference harness's serving sweep
        mS, vS = p.predict_y(X[:6], S=S, key=jax.random.PRNGKey(S))
        assert mS.shape == (S, 6, 1) and vS.shape == (S, 6, 1)
        assert np.all(np.isfinite(np.asarray(mS)))
    assert p.compiles == 1, p.trace_counts
    for S in (1, 5, 25, 100):
        d = p.predict_density(X[:6], Y[:6], S=S)
        assert d.shape == (6, 1)
        assert np.all(np.isfinite(np.asarray(d)))
    assert p.compiles == 2, p.trace_counts   # one more program (density)


def test_chunking_above_max_bucket():
    m, X, _ = _model()
    p = DynamicPredictor(m, buckets=(5,))
    f, v = p.predict_f(X[:4], S=12)           # 3 chunks of the B=5 program
    assert f.shape == (12, 4, 1) and v.shape == (12, 4, 1)
    assert p.compiles == 1
    # chunk keys are decorrelated: samples are not all identical
    assert float(jnp.std(f[:, 0, 0])) > 0.0


def test_exact_vs_plain_methods_single_layer():
    """L=1: conditional moments are deterministic, so keeping the first
    S of B samples equals the plain S-sample call bitwise-ish."""
    m, X, Y = _model(L=1)
    p = DynamicPredictor(m, buckets=(8,))
    key = jax.random.PRNGKey(0)
    for S in (1, 3, 8):
        a = p.predict_f(X[:5], S=S, key=key)
        b = m.predict_f(X[:5], S=S, key=key)
        for ai, bi in zip(a, b):
            assert_allclose(np.asarray(ai), np.asarray(bi), rtol=1e-12)
        da = p.predict_density(X[:5], Y[:5], S=S, key=key)
        db = m.predict_density(X[:5], Y[:5], S=S, key=key)
        assert_allclose(np.asarray(da), np.asarray(db), rtol=1e-12)
    assert p.compiles == 2                    # one per program kind


def test_update_with_fresh_params_does_not_retrace():
    m, X, _ = _model()
    p = DynamicPredictor(m, buckets=(4,))
    p.predict_f(X[:4], S=2)
    n = p.compiles
    layers = list(m.layers)
    layers[0] = layers[0].replace(
        q_mu=layers[0].q_mu.with_value(layers[0].q_mu.value + 0.3))
    p.update(m.replace(layers=layers))
    out = p.predict_f(X[:4], S=4)
    assert p.compiles == n                    # same program, new params
    assert np.all(np.isfinite(np.asarray(out[0])))


def test_rejects_bad_buckets_and_donated_models():
    import pytest
    m, X, _ = _model()
    with pytest.raises(ValueError):
        DynamicPredictor(m, buckets=())
    with pytest.raises(ValueError):
        DynamicPredictor(m).predict_f(X[:2], S=0)
    m.layers[0].q_mu.unconstrained.delete()
    with pytest.raises(RuntimeError, match="donated"):
        DynamicPredictor(m)
    # update() guards too (code-review round-3 finding: it used to
    # accept the consumed pytree silently and die at the next dispatch)
    m2, _, _ = _model()
    with pytest.raises(RuntimeError, match="donated"):
        DynamicPredictor(m2).update(m)
