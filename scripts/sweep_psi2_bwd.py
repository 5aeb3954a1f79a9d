"""Round-5 psi2 kernel-gate sweep (round-4 VERDICT next #3).

Measures, at the compute-bound collapsed shape (N=8192, M=256 by
default), the end-to-end `_rbf_cross_psi2` fwd and fwd+bwd times for
every route x D:

  - xla          : blocked XLA fwd + XLA autodiff bwd
  - hybrid/vpu   : blocked XLA fwd + Pallas recompute bwd, unrolled
                   per-d VPU chains (~(19 + 6(D-1)) ops/element — the
                   round-4 shipped kernel, loses above D ~ 3)
  - hybrid/mxu   : blocked XLA fwd + Pallas recompute bwd with MXU
                   contractions (round-5: ~(11 + 2D) ops/element,
                   D-dependent only through the pre-recompute chain)
  - pallas fwd   : the all-Pallas forward (fwd-only leg — XLA's fused
                   fwd wins at small D; does it still at D >= 4, where
                   the R einsum becomes a real batched matmul?)

Output: one table row per (D, leg); paste into PERF.md and set
PSI2_KERNEL_MAX_D / _BWD_MXU_MIN_D from the measured crossovers.

Run on chip:  python scripts/sweep_psi2_bwd.py --N 8192 --M 256
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def scan_time(f, x0, iters=30, n=6):
    from doubly_stochastic_dgp_tpu.utils.timing import timed_per_call

    @jax.jit
    def run(x, key):
        x = x + 0.0 * jax.random.uniform(key, (), x.dtype)

        def body(c, _):
            return f(c), None

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c.ravel()[0]

    key = jax.random.PRNGKey(0)
    t = timed_per_call(
        lambda i: run(x0, jax.random.fold_in(key, i + (1 << 20))), n=n)
    return t * 1e3 / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=8192)
    ap.add_argument("--M", type=int, default=256)
    ap.add_argument("--Ds", type=str, default="1,2,3,4,6,8")
    ap.add_argument("--pre-mxu-min-d", type=int, default=None,
                    help="override psi2._PRE_MXU_MIN_D for every kernel "
                         "leg (99 = force the VPU pre chain, 1 = force "
                         "the batched-MXU pre dot)")
    args = ap.parse_args()
    N, M = args.N, args.M

    import bench
    bench._enable_compile_cache()

    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import temp_config
    from doubly_stochastic_dgp_tpu.ops import psi_stats
    from doubly_stochastic_dgp_tpu.ops.pallas import psi2 as kpsi2
    from doubly_stochastic_dgp_tpu.ops.psi_stats import _rbf_cross_psi2

    dsd.set_default_float("float32")
    rng = np.random.RandomState(0)

    if args.pre_mxu_min_d is not None:
        kpsi2._PRE_MXU_MIN_D = args.pre_mxu_min_d
    print(f"# N={N} M={M}  block rows={kpsi2._block_rows(M)}  "
          f"pre_mxu_min_d={kpsi2._PRE_MXU_MIN_D}", flush=True)
    hdr = (f"{'D':>2} {'xla fwd':>9} {'plls fwd':>9} {'xla f+b':>9} "
           f"{'vpu f+b':>9} {'mxu f+b':>9}   best (x vs xla)")
    print(hdr, flush=True)

    for D in [int(d) for d in args.Ds.split(",")]:
        mu = jnp.asarray(rng.randn(N, D).astype("float32"))
        S = jnp.asarray(rng.rand(N, D).astype("float32") * 0.1 + 1e-3)
        Z = jnp.asarray(rng.randn(M, D).astype("float32"))
        kern = dsd.RBF.make(D)

        def fwd(c):
            with jax.default_matmul_precision("highest"):
                p2 = _rbf_cross_psi2(kern, kern, c, S, Z)
            return c + 1e-12 * jnp.sum(p2)

        def fwdbwd(c):
            g = jax.grad(lambda m: jnp.sum(
                _rbf_cross_psi2(kern, kern, m, S, Z) ** 2))(c)
            return c + 1e-12 * g

        res = {}
        with temp_config(psi2_impl="xla"):
            try:
                res["xla_f"] = scan_time(fwd, mu)
            except Exception as e:
                print(f"#   xla fwd failed at D={D}: "
                      f"{type(e).__name__}", flush=True)
                res["xla_f"] = float("nan")
            try:
                # NB at N=8192 M=512 this leg is IMPOSSIBLE on one
                # v5e: XLA autodiff saves the (N, M, M) residual blocks
                # across the data scan (~16.5 GB > 15.75 GB HBM) — the
                # recompute-backward kernel is the memory enabler
                # there, not just the faster route (round-5 record)
                res["xla_fb"] = scan_time(fwdbwd, mu)
            except Exception as e:
                oom = any(s in str(e) for s in
                          ("RESOURCE_EXHAUSTED", "Ran out of memory",
                           "hbm"))
                print(f"#   xla fwd+bwd failed at D={D}: "
                      f"{type(e).__name__}"
                      f"{' (HBM OOM at large N*M^2)' if oom else ''}",
                      flush=True)
                res["xla_fb"] = float("nan")
        # all-pallas forward (fwd-only A/B; not a production route):
        # swap psi2_core for the raw pallas fwd so the leg runs the
        # REAL op staging end-to-end (fresh jit per leg via scan_time)
        saved_core = kpsi2.psi2_core
        try:
            kpsi2.psi2_core = (lambda U, V, w, ld, Zk, interp=False:
                               kpsi2.psi2_core_pallas_fwd(U, V, w, ld,
                                                          Zk, interp))
            with temp_config(psi2_impl="pallas"):
                res["plls_f"] = scan_time(fwd, mu)
        except Exception as e:  # Mosaic rejection etc. — record, go on
            print(f"#   pallas fwd failed at D={D}: {type(e).__name__}",
                  flush=True)
            res["plls_f"] = float("nan")
        finally:
            kpsi2.psi2_core = saved_core
        saved = (kpsi2._BWD_MXU_MIN_D, kpsi2._BWD_MXU_MIN_D_LARGE_M)

        def force_bwd(v):
            # both thresholds: the auto rule is (M, D)-aware since the
            # M=512 measurements
            kpsi2._BWD_MXU_MIN_D = v
            kpsi2._BWD_MXU_MIN_D_LARGE_M = v

        try:
            with temp_config(psi2_impl="pallas"):
                force_bwd(99)                     # force VPU bwd
                res["vpu_fb"] = scan_time(fwdbwd, mu)
                force_bwd(1)                      # force MXU bwd
                try:
                    res["mxu_fb"] = scan_time(fwdbwd, mu)
                except Exception as e:
                    print(f"#   mxu bwd failed at D={D}: "
                          f"{type(e).__name__}: {e}", flush=True)
                    res["mxu_fb"] = float("nan")
        finally:
            kpsi2._BWD_MXU_MIN_D, kpsi2._BWD_MXU_MIN_D_LARGE_M = saved
        best = np.nanmin([res["xla_fb"], res["vpu_fb"],
                          res["mxu_fb"]])
        print(f"{D:>2} {res['xla_f']:>9.2f} {res['plls_f']:>9.2f} "
              f"{res['xla_fb']:>9.2f} {res['vpu_fb']:>9.2f} "
              f"{res['mxu_fb']:>9.2f}   "
              f"{res['xla_fb'] / best:.2f}x", flush=True)


if __name__ == "__main__":
    main()
