#!/usr/bin/env python
"""Bisect train-step time: G forward, G fwd+bwd, D fwd+bwd, losses."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(name, fn, *args, n=3):
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    run_t = (time.perf_counter() - t0) / n
    print(f"{name:28s} compile {compile_t:7.1f}s   run {run_t*1e3:9.1f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp

    from mb_istft_vits_tpu.config import Config
    from mb_istft_vits_tpu.losses import discriminator_loss
    from mb_istft_vits_tpu.models import MultiPeriodDiscriminator, Synthesizer
    from mb_istft_vits_tpu.train import create_train_state

    cfg = Config.from_json("configs/ljs_mb_istft_vits.json")
    b, t_x, t_spec = 32, 192, 400
    d = cfg.data
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

    rngs = {"noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
            "slice": jax.random.PRNGKey(3)}

    @jax.jit
    def g_fwd(params):
        out = synth.apply({"params": params}, batch["x"], batch["x_lengths"],
                          batch["spec"], batch["spec_lengths"], train=True,
                          rngs=rngs)
        return out[0]

    y_hat = bench("G forward", g_fwd, state.params_g)

    seg = cfg.train.segment_size
    y = batch["wav"][:, :seg, :]
    y_hat_c = jax.lax.stop_gradient(y_hat)

    @jax.jit
    def d_fwd(params_d):
        outs = disc.apply({"params": params_d}, y, y_hat_c)
        loss, _, _ = discriminator_loss(outs[0], outs[1])
        return loss

    bench("D forward", d_fwd, state.params_d)

    @jax.jit
    def d_fwd_bwd(params_d):
        return jax.value_and_grad(
            lambda p: discriminator_loss(
                *disc.apply({"params": p}, y, y_hat_c)[:2])[0]
        )(params_d)

    bench("D fwd+bwd", d_fwd_bwd, state.params_d)

    @jax.jit
    def g_fwd_bwd(params_g):
        def loss_fn(p):
            out = synth.apply({"params": p}, batch["x"],
                              batch["x_lengths"], batch["spec"],
                              batch["spec_lengths"], train=True, rngs=rngs)
            return jnp.mean(jnp.abs(out[0].astype(jnp.float32)))

        return jax.value_and_grad(loss_fn)(params_g)

    bench("G fwd+bwd (l1 proxy)", g_fwd_bwd, state.params_g)

    @jax.jit
    def gd_fwd_bwd(params_g):
        def loss_fn(p):
            out = synth.apply({"params": p}, batch["x"],
                              batch["x_lengths"], batch["spec"],
                              batch["spec_lengths"], train=True, rngs=rngs)
            y_d_r, y_d_g, fr, fg = disc.apply(
                {"params": state.params_d}, y, out[0])
            return sum(jnp.mean((1 - o.astype(jnp.float32)) ** 2)
                       for o in y_d_g)

        return jax.value_and_grad(loss_fn)(params_g)

    bench("G+D-adv fwd+bwd", gd_fwd_bwd, state.params_g)


if __name__ == "__main__":
    main()
