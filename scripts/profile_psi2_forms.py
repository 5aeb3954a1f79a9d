"""On-chip A/B of the two RBF psi2 block forms in ONE session (so pool /
RTT conditions are identical):

  naive:     quad = mu^2 - 2 mu c + c^2 with two (B, M, M) einsum
             intermediates (t_cross, t_c2) — the round-2 form.
  separated: c = beta z_a + alpha z_b rank-separation — one (B, M, M)
             batched-matmul intermediate R, rank-1 broadcasts fused
             into the exp — the round-3 candidate.

Measures (a) scan-amortized per-op time of psi_statistics fwd and the
FULL training pullback (grad wrt mu, S, Z, log-lengthscales — the
isolated grad-wrt-mu probe in profile_collapsed_scan.py undersells the
real VJP), and (b) end-to-end damianou_L2 / collapsed_L2 bench rows at
inner_steps=50 (dispatch-amortized; the matrix default of 20 leaves
damianou at the RTT floor), by monkeypatching
ops.psi_stats._rbf_cross_psi2 between runs.
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ITERS = 50


def scan_time(f, x0, iters=ITERS, n=8):
    from doubly_stochastic_dgp_tpu.utils.timing import timed_per_call

    @jax.jit
    def run(x, key):
        x = jax.tree_util.tree_map(
            lambda a: a + 0.0 * jax.random.uniform(key, (), a.dtype), x)

        def body(c, _):
            return f(c), None

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jax.tree_util.tree_map(lambda a: a.ravel()[0], c)

    key = jax.random.PRNGKey(0)
    t = timed_per_call(
        lambda i: run(x0, jax.random.fold_in(key, i + (1 << 20))), n=n)
    return t * 1e3 / iters


def _block_naive(va, vb, a, b, Z, mu_b, S_b, w_b):
    h = a * b / (a + b)
    zz = Z[:, None, :] - Z[None, :, :]
    log_zz = -0.5 * jnp.sum(zz ** 2 / (a + b), axis=-1)
    c = (b * Z[:, None, :] + a * Z[None, :, :]) / (a + b)
    denom = h + S_b
    logdet = 0.5 * jnp.sum(jnp.log(h) - jnp.log(denom), axis=-1)
    inv = 1.0 / denom
    t_mu2 = jnp.sum(mu_b ** 2 * inv, axis=-1)
    t_cross = jnp.einsum("nd,abd->nab", mu_b * inv, c)
    t_c2 = jnp.einsum("nd,abd->nab", inv, c ** 2)
    quad = jnp.minimum(
        -0.5 * (t_mu2[:, None, None] - 2.0 * t_cross + t_c2), 0.0)
    psi2_n = va * vb * jnp.exp(
        logdet[:, None, None] + log_zz[None, :, :] + quad)
    return jnp.einsum("n,nab->ab", w_b, psi2_n)


def _block_separated(va, vb, a, b, Z, mu_b, S_b, w_b):
    h = a * b / (a + b)
    zz = Z[:, None, :] - Z[None, :, :]
    log_zz = -0.5 * jnp.sum(zz ** 2 / (a + b), axis=-1)
    alpha = a / (a + b)
    beta = b / (a + b)
    denom = h + S_b
    logdet = 0.5 * jnp.sum(jnp.log(h) - jnp.log(denom), axis=-1)
    inv = 1.0 / denom
    t_mu2 = jnp.sum(mu_b ** 2 * inv, axis=-1)
    P1 = (mu_b * inv * beta) @ Z.T
    P2 = (mu_b * inv * alpha) @ Z.T
    Q1 = (inv * beta ** 2) @ (Z ** 2).T
    Q2 = (inv * alpha ** 2) @ (Z ** 2).T
    Zw = Z[None, :, :] * (inv * alpha * beta)[:, None, :]
    R = jnp.matmul(Zw, Z.T)
    quad = jnp.minimum(
        -0.5 * ((t_mu2[:, None] - 2.0 * P1 + Q1)[:, :, None]
                + (Q2 - 2.0 * P2)[:, None, :]
                + 2.0 * R), 0.0)
    psi2_n = va * vb * jnp.exp(
        logdet[:, None, None] + log_zz[None, :, :] + quad)
    return jnp.einsum("n,nab->ab", w_b, psi2_n)


def per_op(form_name, block, mu, S, Z, ls2):
    """fwd and full-pullback times of one psi2 data-sum at HIGHEST."""
    w = jnp.ones((mu.shape[0],), mu.dtype)

    def psi2_of(mu_, S_, Z_, ls2_):
        with jax.default_matmul_precision("highest"):
            return block(1.0, 1.0, ls2_, ls2_, Z_, mu_, S_, w)

    def f_fwd(c):
        return c + 1e-12 * jnp.sum(psi2_of(c, S, Z, ls2)) * jnp.ones_like(c)

    def f_vjp(c):
        g = jax.grad(lambda m, s, z, l:
                     jnp.sum(psi2_of(m, s, z, l)), argnums=(0, 1, 2, 3))(
                         c, S, Z, ls2)
        return c + 1e-12 * (g[0] + g[1]
                            + jnp.sum(g[2]) + jnp.sum(g[3]))

    print(f"psi2[{form_name}] fwd        "
          f"{scan_time(f_fwd, mu):8.4f} ms", flush=True)
    print(f"psi2[{form_name}] full pullback "
          f"{scan_time(f_vjp, mu):8.4f} ms", flush=True)


def end_to_end(tag):
    import bench
    ns = argparse.Namespace(precision=None, pallas=False)
    bench._set_numerics(ns)
    X, Y, _ = bench._regression_data()
    for kind, build in [("damianou", bench.build_damianou),
                        ("collapsed", bench.build_collapsed)]:
        m = build(X, Y, M=100, L=2, N=1500)
        rate, loss, _ = bench.measure(m, 1500, 300, inner_steps=50)
        print(f"e2e[{tag}] {kind}_L2: {rate:.1f} steps/s "
              f"({1e3 / rate:.3f} ms/step) final={loss:.1f}", flush=True)


def main():
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import config
    from doubly_stochastic_dgp_tpu.ops import psi_stats

    dsd.set_default_float("float32")
    dsd.set_default_jitter(1e-5)
    config.solve_mode = "inverse"

    rng = np.random.RandomState(0)
    N, M, D = 1500, 100, 8
    mu = jnp.asarray(rng.randn(N, D).astype("float32"))
    S = jnp.asarray(rng.rand(N, D).astype("float32") * 0.1 + 1e-3)
    Z = jnp.asarray(rng.randn(M, D).astype("float32"))
    ls2 = jnp.ones((D,), jnp.float32)

    per_op("naive", _block_naive, mu, S, Z, ls2)
    per_op("separated", _block_separated, mu, S, Z, ls2)

    def make_patched(block):
        def cross(ka, kb, mu_, S_, Z_):
            va = ka.variance.value
            vb = kb.variance.value
            a = ka.lengthscales.value ** 2 + jnp.zeros_like(mu_[0])
            b = kb.lengthscales.value ** 2 + jnp.zeros_like(mu_[0])

            def bs(mb, sb, wb):
                return block(va, vb, a, b, Z_, mb, sb, wb)

            return psi_stats._blocked_data_sum(
                bs, mu_, S_, (Z_.shape[0], Z_.shape[0]))
        return cross

    for tag, block in [("naive", _block_naive),
                       ("separated", _block_separated)]:
        psi_stats._rbf_cross_psi2 = make_patched(block)
        end_to_end(tag)


if __name__ == "__main__":
    main()
