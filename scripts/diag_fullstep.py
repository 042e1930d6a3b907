#!/usr/bin/env python
"""Time the composed train step with and without donation/sharding."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mb_istft_vits_tpu.config import Config
    from mb_istft_vits_tpu.train import create_train_state, make_train_step

    cfg = Config.from_json("configs/ljs_mb_istft_vits.json")
    b, t_x, t_spec = 32, 192, 400
    rng = np.random.RandomState(0)
    batch = {
        "x": jnp.asarray(rng.randint(1, cfg.model.n_vocab,
                                     size=(b, t_x)).astype(np.int32)),
        "x_lengths": jnp.asarray(np.full(b, t_x, np.int32)),
        "spec": jnp.asarray((rng.randn(b, t_spec, 513) ** 2)
                            .astype(np.float32)),
        "spec_lengths": jnp.asarray(np.full(b, t_spec, np.int32)),
        "wav": jnp.asarray(rng.uniform(-0.5, 0.5, (b, t_spec * 256, 1))
                           .astype(np.float32)),
        "wav_lengths": jnp.asarray(np.full(b, t_spec * 256, np.int32)),
    }
    state, synth, disc = create_train_state(
        cfg, jax.random.PRNGKey(0), jax.tree.map(lambda a: a[:2], batch))

    step_nodonate = jax.jit(make_train_step(cfg, synth, disc))

    t0 = time.perf_counter()
    state2, metrics = step_nodonate(state, batch)
    jax.block_until_ready(metrics["loss/g/total"])
    print(f"[no-donate] compile+step0: {time.perf_counter()-t0:.1f}s")

    for trial in range(3):
        t0 = time.perf_counter()
        state2, metrics = step_nodonate(state2, batch)
        jax.block_until_ready(metrics["loss/g/total"])
        print(f"[no-donate] step: {(time.perf_counter()-t0)*1e3:.0f} ms")

    step_donate = jax.jit(make_train_step(cfg, synth, disc),
                          donate_argnums=0)
    t0 = time.perf_counter()
    state3, metrics = step_donate(state2, batch)
    jax.block_until_ready(metrics["loss/g/total"])
    print(f"[donate] compile+step0: {time.perf_counter()-t0:.1f}s")
    for trial in range(3):
        t0 = time.perf_counter()
        state3, metrics = step_donate(state3, batch)
        jax.block_until_ready(metrics["loss/g/total"])
        print(f"[donate] step: {(time.perf_counter()-t0)*1e3:.0f} ms")


if __name__ == "__main__":
    main()
