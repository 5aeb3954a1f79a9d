"""Per-op TPU breakdown of the large_M bench row (M=512, batch 8192,
L=2) — round-2 VERDICT next-step #3: account for the ~55% of the
achievable matmul ceiling the step does NOT reach, by timing each
pipeline stage jitted alone at the exact step shapes, and probing the
two candidate levers (cross-layer batched Cholesky; solve-mode ops).

Stages timed (per step, L=2 layers, R = S*B rows):
  gram_kuf    : Kuf = K(Z, X)            (M, R)  2*R*M*D flops
  gram_kdiag  : Kdiag(X)                 (R,)    elementwise
  chol        : safe_cholesky(Kuu)       (M, M)  ~M^3/3, sequential
  inv_lower   : triangular inverse       (M, M)  ~M^3/3, sequential
  stage_G     : G = Li @ Kuf             (M, R)  2*M^2*R   <- MXU
  stage_H     : H = C^T G (D_out-batched)        2*Do*M^2*R <- MXU
  var_epilog  : Kff - colsum(G*G) + colsum(H*H)  elementwise
  full fwd / value_and_grad / adam step  (the end-to-end context)

Levers probed:
  batched_chol: one (2, M, M) Cholesky for both layers vs 2 sequential
  batched_inv : same for the triangular inverse
Output: a markdown table for PERF.md.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax


def timeit(f, *args, n=20):
    from doubly_stochastic_dgp_tpu.utils.timing import timed_per_call

    *head, key = args
    return timed_per_call(
        lambda i: f(*head, jax.random.fold_in(key, i + 1)), n=n) * 1e3


def main():
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import config
    from doubly_stochastic_dgp_tpu.ops.linalg import (inv_lower,
                                                      safe_cholesky)
    from doubly_stochastic_dgp_tpu.training.optim import masked_optimizer

    dsd.set_default_float("float32")
    dsd.set_default_jitter(1e-5)
    config.solve_mode = "inverse"

    rng = np.random.RandomState(0)
    N, D, M, S, B, L = 8192, 8, 512, 1, 8192, 2
    X = rng.rand(N, D).astype("float32")
    Y = rng.randn(N, 1).astype("float32")
    Z = X[:M].copy()
    key = jax.random.PRNGKey(0)

    kernels = []
    for l in range(L):
        k = dsd.RBF.make(D)
        if l < L - 1:
            k = k + dsd.White.make(D, variance=2e-6, trainable=False)
        kernels.append(k)
    m = dsd.DGP.build(X, Y, Z, kernels, dsd.Gaussian.make(0.05),
                      num_samples=S)
    Xb = jnp.asarray(X[:B])
    Yb = jnp.asarray(Y[:B])

    lay0 = m.layers[0]
    kern = lay0.kern
    Zv = jnp.asarray(Z)
    R = S * B
    Do_stack = [l.num_outputs for l in m.layers]

    rows = []

    def rec(name, ms, flops=None):
        tf = (flops / (ms * 1e-3) / 1e12) if flops else None
        rows.append((name, ms, tf))
        tf_txt = f" {tf:6.1f} TF/s" if tf else ""
        print(f"{name:<28} {ms:8.3f} ms{tf_txt}", flush=True)

    # ---- isolated stages (jitted alone; key arg forces fresh dispatch)
    Xr = jnp.tile(Xb, (S, 1))[:R]

    f_kuf = jax.jit(lambda z, x, k: kern.K(z, x + 0 * k[0]))
    rec("gram_kuf (per layer)", timeit(f_kuf, Zv, Xr, key),
        2 * R * M * D)

    f_kd = jax.jit(lambda x, k: kern.Kdiag(x + 0 * k[0]))
    rec("gram_kdiag (per layer)", timeit(f_kd, Xr, key))

    Kuu = kern.K(Zv) + 1e-5 * jnp.eye(M)
    f_chol = jax.jit(lambda a, k: safe_cholesky(a + 0.0 * k[0], 1e-5))
    rec("safe_cholesky M=512", timeit(f_chol, Kuu, key), M ** 3 / 3)

    Lu = np.linalg.cholesky(np.asarray(Kuu, dtype=np.float64)).astype(
        "float32")
    f_inv = jax.jit(lambda a, k: inv_lower(a + 0.0 * k[0]))
    rec("inv_lower M=512", timeit(f_inv, jnp.asarray(Lu), key), M ** 3 / 3)

    Li = jnp.asarray(np.linalg.inv(Lu))
    Kuf = kern.K(Zv, Xr)
    f_g = jax.jit(lambda a, b, k: a @ (b + 0 * k[0]))
    rec("stage_G = Li@Kuf (per layer)", timeit(f_g, Li, Kuf, key),
        2 * M * M * R)

    G = Li @ Kuf
    for Do in sorted(set(Do_stack)):
        C = jnp.asarray(rng.randn(Do, M, M).astype("float32"))
        f_h = jax.jit(lambda c, g, k: jnp.einsum("dmi,ib->dmb", c,
                                                 g + 0 * k[0]))
        rec(f"stage_H (Do={Do})", timeit(f_h, C, G, key),
            2 * Do * M * M * R)

    f_ve = jax.jit(lambda g, k: jnp.maximum(
        1.0 - jnp.sum(g * g, axis=0), 0.0) + 0 * k[0])
    rec("var_epilog (per layer)", timeit(f_ve, G, key))

    # ---- lever: cross-layer batched factorization
    Kb = jnp.stack([Kuu, Kuu + 1e-3 * jnp.eye(M)])
    f_bchol = jax.jit(lambda a, k: jnp.linalg.cholesky(
        a + 0.0 * k[0] + 1e-5 * jnp.eye(M)))
    rec("batched chol (2, M, M)", timeit(f_bchol, Kb, key),
        2 * M ** 3 / 3)
    Lb = jnp.stack([jnp.asarray(Lu), jnp.asarray(Lu)])
    f_binv = jax.jit(jax.vmap(inv_lower))
    f_binv_k = jax.jit(lambda a, k: jax.vmap(inv_lower)(a + 0.0 * k[0]))
    rec("batched inv_lower (2, M, M)", timeit(f_binv_k, Lb, key),
        2 * M ** 3 / 3)

    # ---- end-to-end context
    fwd = jax.jit(lambda mm, x, y, k: mm.elbo(x, y, k))
    rec("elbo fwd (full)", timeit(fwd, m, Xb, Yb, key))

    vgrad = jax.jit(lambda mm, x, y, k: jax.value_and_grad(
        lambda m2: -m2.elbo(x, y, k))(mm)[0])
    rec("value_and_grad (full)", timeit(vgrad, m, Xb, Yb, key))

    tx = masked_optimizer(optax.adam(0.01), m)
    st = tx.init(m)

    @jax.jit
    def step(mm, s, x, y, k):
        loss, g = jax.value_and_grad(lambda m2: -m2.elbo(x, y, k))(mm)
        u, s = tx.update(g, s, mm)
        return optax.apply_updates(mm, u), s, loss

    def stepper(i):
        nonlocal m, st
        # i can be negative during the timer's warmup phase; offset it
        # (fold_in requires a uint32-representable value)
        m2, st2, loss = step(m, st, Xb, Yb,
                             jax.random.fold_in(key, i + 1 << 20))
        return loss
    from doubly_stochastic_dgp_tpu.utils.timing import timed_per_call
    ms = timed_per_call(stepper, n=20) * 1e3
    rec("adam step (full)", ms)

    print("\n| op | ms | TFLOP/s |")
    print("|---|---|---|")
    for name, t, tf in rows:
        print(f"| {name} | {t:.3f} | "
              f"{'' if tf is None else f'{tf:.1f}'} |")


if __name__ == "__main__":
    main()
