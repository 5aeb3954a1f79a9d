"""Round-5 stress (round-4 VERDICT next #5 done-criterion): train
collapsed_L2-shape f32 full-batch models for 2000+ steps across 5
seeds with the reject-nonfinite trajectory guard — zero NaN endpoints.

The unguarded trajectory is on record walking into NaN at ~800 steps
(round-4: the repeat-horizon incident and the fused-inverse reroll,
PERF.md).  With the guard the endpoint loss and every parameter leaf
must be finite for every seed; the script also reports how many
dispatches ended with a rollback engaged (scale < 1), as a rough
rejection-rate observable.

Run on chip:  python scripts/stress_collapsed_guard.py --steps 2000
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _perturb(model, seed):
    """Seed-dependent init jitter.  At L=2 the collapsed/Damianou
    bounds are DETERMINISTIC (the inner propagation's mean/var given
    raw inputs involves no sampling — the PRNG key only matters from
    L=3 up), so distinct trajectories need distinct INITS: nudge every
    trainable leaf by ~1e-3 relative noise."""
    if seed == 0:
        return model
    import jax.tree_util as jtu

    from doubly_stochastic_dgp_tpu.utils.modules import Param

    rng = np.random.RandomState(seed)

    def nudge(leaf):
        if isinstance(leaf, Param) and leaf.trainable:
            v = np.asarray(leaf.value)
            noise = np.asarray(rng.standard_normal(size=v.shape),
                               dtype=v.dtype)
            return leaf.with_value(jnp.asarray(
                (v + 1e-3 * (np.abs(v) + 0.1) * noise).astype(v.dtype)))
        return leaf

    return jtu.tree_map(nudge, model,
                        is_leaf=lambda x: isinstance(x, Param))


def main():
    import optax

    import bench
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.training.loop import (
        make_scan_train_step)
    from doubly_stochastic_dgp_tpu.training.optim import masked_optimizer

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--kind", default="both",
                    choices=["damianou", "collapsed", "both"])
    args = ap.parse_args()

    class A:
        precision = None
        pallas = False

    bench._set_numerics(A())
    X, Y, _ = bench._regression_data()

    kinds = (["damianou", "collapsed"] if args.kind == "both"
             else [args.kind])
    n_calls = -(-args.steps // args.inner)
    failures = 0
    for kind in kinds:
        build = (bench.build_damianou if kind == "damianou"
                 else bench.build_collapsed)
        for seed in range(args.seeds):
            model = build(X, Y, M=100, L=2, N=1500)
            model = _perturb(model, seed)
            tx = masked_optimizer(optax.adam(0.01), model)
            opt_state = tx.init(model)
            step = make_scan_train_step(tx, inner_steps=args.inner,
                                        reject_nonfinite=True)
            key = jax.random.PRNGKey(1000 + seed)
            losses = []
            for i in range(n_calls):
                model, opt_state, loss = step(
                    model, opt_state, jax.random.fold_in(key, i))
                losses.append(float(loss))
            finite_params = all(
                bool(jnp.all(jnp.isfinite(leaf)))
                for leaf in jax.tree_util.tree_leaves(model))
            ok = finite_params and np.isfinite(losses[-1])
            failures += 0 if ok else 1
            print(f"{kind:<10} seed={seed} steps={n_calls * args.inner} "
                  f"final_loss={losses[-1]:.2f} "
                  f"params_finite={finite_params} "
                  f"nan_dispatches={sum(not np.isfinite(l) for l in losses)}"
                  f" {'OK' if ok else 'FAIL'}", flush=True)
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}",
          flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
