#!/usr/bin/env python
"""Full train-step smoke across TWO real processes (multi-host SPMD).

Each process owns 2 virtual CPU devices; together they form a 4-device
'data' mesh. Each rank feeds its process-local half of the global batch
(shard_batch -> make_array_from_process_local_data) and runs the actual
two-program GAN train step; XLA's gradient all-reduce crosses the
process boundary over gloo. Both ranks must report identical losses —
the single-program-multiple-data invariant.

Run:  python scripts/smoke_multihost_train.py          (launcher)
      python scripts/smoke_multihost_train.py PORT ID  (worker, internal)

Too slow for the default pytest suite (~2 CPU compiles of the train
step, minutes each); tests/test_multihost.py covers the input path
cheaply. This script is the end-to-end proof.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(port: str, pid: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    import numpy as np

    sys.path.insert(0, REPO)
    import __graft_entry__ as ge
    from mb_istft_vits_tpu.parallel import create_mesh, shard_batch
    from mb_istft_vits_tpu.train import create_train_state, make_train_step

    assert jax.device_count() == 4 and jax.local_device_count() == 2

    cfg = ge._tiny_config()
    global_batch = ge._tiny_batch(b=8)
    # this rank's local half (rank-strided, like BucketedBatcher)
    local = {k: np.asarray(v)[pid::2] for k, v in global_batch.items()}

    mesh = create_mesh()
    state, synth, disc = create_train_state(
        cfg, jax.random.PRNGKey(0), local
    )
    batch = shard_batch(local, mesh)
    assert batch["x"].shape[0] == 8, batch["x"].shape  # global batch

    step = make_train_step(cfg, synth, disc)
    for i in range(2):
        state, metrics = step(state, batch)
        g = float(jax.device_get(metrics["loss/g/total"]))
        d = float(jax.device_get(metrics["loss/d/total"]))
        assert np.isfinite(g) and np.isfinite(d), (g, d)
        print(f"proc {pid} step {i}: loss_g={g:.6f} loss_d={d:.6f}",
              flush=True)
    print(f"proc {pid}: ok", flush=True)


def launcher() -> None:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    try:
        outs = [p.communicate(timeout=1800)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:  # hung rank: kill, don't orphan
                p.kill()
    print("\n--- rank outputs ---")
    for o in outs:
        print(o)
    assert all(p.returncode == 0 for p in procs), "a rank failed"
    # SPMD invariant: both ranks computed the SAME global losses
    lines0 = [l for l in outs[0].splitlines() if l.startswith("proc 0 step")]
    lines1 = [l for l in outs[1].splitlines() if l.startswith("proc 1 step")]
    vals0 = [l.split("loss_g=")[1] for l in lines0]
    vals1 = [l.split("loss_g=")[1] for l in lines1]
    assert vals0 == vals1, (vals0, vals1)
    print("multihost train-step smoke: OK (ranks agree:", vals0, ")")


if __name__ == "__main__":
    if len(sys.argv) == 3:
        worker(sys.argv[1], int(sys.argv[2]))
    else:
        launcher()
