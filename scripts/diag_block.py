#!/usr/bin/env python
"""Separate train-step compute time from block_until_ready cost over the
axon tunnel (per-buffer RPC suspicion)."""

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
    n_leaves = len(jax.tree.leaves(state))
    print(f"state leaves: {n_leaves}")

    step = jax.jit(make_train_step(cfg, synth, disc))
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss/g/total"])
    print(f"compile: {time.perf_counter()-t0:.1f}s")

    # 5 steps, blocking only on the loss scalar
    t0 = time.perf_counter()
    for _ in range(5):
        state, metrics = step(state, batch)
        metrics["loss/g/total"].block_until_ready()
    print(f"5 steps (block scalar): {(time.perf_counter()-t0):.2f}s")

    # now block on one param leaf
    t0 = time.perf_counter()
    leaf = jax.tree.leaves(state.params_g)[0]
    leaf.block_until_ready()
    print(f"block 1 param leaf: {time.perf_counter()-t0:.3f}s")

    # now block on the whole state
    t0 = time.perf_counter()
    jax.block_until_ready(state)
    print(f"block full state ({n_leaves} leaves): "
          f"{time.perf_counter()-t0:.2f}s")

    # again (everything already done — measures pure RPC overhead)
    t0 = time.perf_counter()
    jax.block_until_ready(state)
    print(f"block full state again: {time.perf_counter()-t0:.2f}s")

    # one more step then fetch a single scalar via device_get
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    v = float(jax.device_get(metrics["loss/g/total"]))
    print(f"step + device_get scalar: {time.perf_counter()-t0:.2f}s "
          f"(loss {v:.2f})")


if __name__ == "__main__" and "--sharded" not in sys.argv:
    main()


def sharded_variant():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mb_istft_vits_tpu.config import Config
    from mb_istft_vits_tpu.parallel import create_mesh, shard_batch
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
    mesh = create_mesh()
    sbatch = shard_batch(batch, mesh)
    step = jax.jit(make_train_step(cfg, synth, disc))
    import time as _t

    t0 = _t.perf_counter()
    state, metrics = step(state, sbatch)
    metrics["loss/g/total"].block_until_ready()
    print(f"[sharded] compile+step0: {_t.perf_counter()-t0:.1f}s")
    t0 = _t.perf_counter()
    for _ in range(3):
        state, metrics = step(state, sbatch)
        metrics["loss/g/total"].block_until_ready()
    print(f"[sharded] 3 steps: {_t.perf_counter()-t0:.2f}s")


if __name__ == "__main__" and "--sharded" in sys.argv:
    sharded_variant()
