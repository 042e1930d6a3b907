#!/usr/bin/env python
"""Isolate optimizer update + global-norm cost over the 1698-leaf tree."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(name, fn, *args, n=2):
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
    run_t = (time.perf_counter() - t0) / n
    print(f"{name:32s} compile {compile_t:7.1f}s   run {run_t*1e3:9.1f} ms",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from mb_istft_vits_tpu.config import Config
    from mb_istft_vits_tpu.train import create_train_state
    from mb_istft_vits_tpu.train.step import _global_norm, make_optimizers

    cfg = Config.from_json("configs/ljs_mb_istft_vits.json")
    rng = np.random.RandomState(0)
    batch = {
        "x": jnp.zeros((2, 16), jnp.int32) + 1,
        "x_lengths": jnp.asarray([16, 16], jnp.int32),
        "spec": jnp.asarray((rng.randn(2, 40, 513) ** 2).astype(np.float32)),
        "spec_lengths": jnp.asarray([40, 40], jnp.int32),
    }
    state, synth, disc = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    tx_g, tx_d = make_optimizers(cfg)
    n = len(jax.tree.leaves(state.params_g))
    print(f"G leaves: {n}")

    grads = jax.tree.map(lambda a: a * 0.001, state.params_g)

    @jax.jit
    def upd(g, opt_state, params):
        u, new_opt = tx_g.update(g, opt_state, params)
        return optax.apply_updates(params, u)

    bench("adamw update (G tree)", upd, grads, state.opt_state_g,
          state.params_g)

    @jax.jit
    def gnorm(g):
        return _global_norm(g)

    bench("global_norm (G tree)", gnorm, grads)

    # fused-flat variant
    flat_tx = optax.flatten(optax.chain(
        optax.clip(1.0),
        optax.adamw(2e-4, b1=0.8, b2=0.99, eps=1e-9, weight_decay=0.01),
    ))
    flat_opt_state = flat_tx.init(state.params_g)

    @jax.jit
    def upd_flat(g, opt_state, params):
        u, new_opt = flat_tx.update(g, opt_state, params)
        return optax.apply_updates(params, u)

    bench("adamw update (flattened)", upd_flat, grads, flat_opt_state,
          state.params_g)


if __name__ == "__main__":
    main()
