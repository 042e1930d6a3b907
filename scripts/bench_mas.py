#!/usr/bin/env python
"""MAS kernel microbenchmark: lax.scan wavefront vs Pallas (two-pass and
fused) across shapes incl. the flagship train shape [64, 400, 200].

Queue-drain timing: N back-to-back dispatches, one device_get sync
(block_until_ready is not a sync point on the axon runtime)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from mb_istft_vits_tpu.utils.platform import apply_env_platform

    apply_env_platform()

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mb_istft_vits_tpu.ops.mas import maximum_path
    from mb_istft_vits_tpu.ops import mas_pallas
    from mb_istft_vits_tpu.ops.mas_pallas import maximum_path_pallas

    scan_jit = jax.jit(lambda a, m: maximum_path(a, m, use_pallas=False))

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    print(f"backend: {jax.devices()[0].device_kind}")

    shapes = [(64, 400, 200), (32, 400, 200), (64, 800, 380), (8, 1000, 380)]
    rng = np.random.RandomState(0)

    def timeit(fn, nc, mask):
        out = fn(nc, mask)
        jax.device_get(out.ravel()[:1])  # compile + drain
        best = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.n):
                out = fn(nc, mask)
            jax.device_get(out.ravel()[:1])
            best.append((time.perf_counter() - t0) / args.n)
        return float(np.median(best)) * 1e3

    for b, t_y, t_x in shapes:
        nc = jnp.asarray(rng.randn(b, t_y, t_x).astype(np.float32))
        t_ys = rng.randint(t_y // 2, t_y + 1, b)
        t_xs = rng.randint(t_x // 2, t_x + 1, b)
        mask = (np.arange(t_y)[None, :, None] < t_ys[:, None, None]) \
            & (np.arange(t_x)[None, None, :] < t_xs[:, None, None])
        mask = jnp.asarray(mask.astype(np.float32))

        scan_ms = timeit(scan_jit, nc, mask)
        row = f"[{b},{t_y},{t_x}] scan {scan_ms:7.2f} ms"
        if on_tpu:
            dec_bytes = (mas_pallas._round_up(t_y, mas_pallas._ROWS_PER_STEP)
                         * mas_pallas._round_up(b, 32)
                         * mas_pallas._round_up(t_x, 128))
            fits = dec_bytes <= mas_pallas._FUSED_VMEM_BUDGET
            two_ms = timeit(
                lambda a, m: maximum_path_pallas(a, m, force="two_pass"),
                nc, mask)
            row += f" | two_pass {two_ms:7.2f} ms ({scan_ms/two_ms:4.2f}x)"
            if fits:
                fused_ms = timeit(
                    lambda a, m: maximum_path_pallas(a, m, force="fused"),
                    nc, mask)
                row += f" | fused {fused_ms:7.2f} ms ({scan_ms/fused_ms:4.2f}x)"
            else:
                row += " | fused: n/a (dec scratch > VMEM budget, auto->two_pass)"
        print(row)


if __name__ == "__main__":
    main()
