"""Multi-host SPMD: 2 real processes × 2 virtual CPU devices each.

The reference is explicitly single-node (NCCL env:// rendezvous,
train_latest.py:46-51). Going beyond it, the trainer supports multi-host
via jax.distributed.initialize (train.py) with host-local input feeding
(parallel/mesh.py:shard_batch). This test runs the actual cross-process
path: coordinator rendezvous, global mesh over both processes' devices,
make_array_from_process_local_data batch assembly, and a collective
reduction that must observe both hosts' data.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # subprocess drives / full-program compiles


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_batch(tmp_path):
    port = _free_port()
    here = os.path.dirname(__file__)
    worker = os.path.join(here, "multihost_worker.py")
    repo_root = os.path.dirname(here)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    # shared tiny wav dataset for the multi-host resident-feeder check
    import numpy as np
    from scipy.io.wavfile import write as wav_write

    rng = np.random.RandomState(0)
    rows = []
    texts = ["k o N n i t i w a", "a i u e o k a k i",
             "t o: ky o: n i i k u", "s a y o: n a r a"]
    for i, n in enumerate([4000, 6000, 9000, 12000]):
        p = tmp_path / f"utt{i}.wav"
        wav_write(p, 8000,
                  (rng.uniform(-0.3, 0.3, n) * 32767).astype(np.int16))
        rows.append(f"{p}|{texts[i]}")
    (tmp_path / "train.txt").write_text("\n".join(rows), encoding="utf-8")
    env["MBIV_MH_DATA"] = str(tmp_path)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    joined = "\n---\n".join(outs)
    failed = any(p.returncode != 0 for p in procs)
    # skip ONLY for the specific "no CPU collectives backend" signature —
    # any other cross-process failure is a real regression and must fail
    unavailable = ("UNIMPLEMENTED" in joined
                   or "collectives implementation" in joined.lower())
    if failed and unavailable:
        pytest.skip(f"CPU cross-process collectives unavailable:\n{joined}")
    assert not failed, joined
    assert "proc 0: ok" in joined and "proc 1: ok" in joined, joined
    assert ("proc 0: resident ok" in joined
            and "proc 1: resident ok" in joined), joined
