"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Each process owns 2 virtual CPU devices; together they form a 4-device
global 'data' mesh. Verifies the real multi-host input path:
rank-strided local batches -> shard_batch (make_array_from_process_local_data
branch) -> a jitted global reduction that must see BOTH hosts' data
(collective over the coordination service / gloo).
"""

import os
import sys


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np

    from mb_istft_vits_tpu.parallel import create_mesh, shard_batch

    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.devices()
    assert jax.device_count() == 4, jax.devices()

    mesh = create_mesh()  # all 4 global devices
    # this host's LOCAL shard of the global batch (train.py's rank-strided
    # BucketedBatcher slice): host 0 contributes ones, host 1 twos
    local = {"x": np.full((2, 3), float(pid + 1), np.float32),
             "none": None}
    batch = shard_batch(local, mesh)
    assert batch["x"].shape == (4, 3), batch["x"].shape
    assert batch["none"] is None

    mean = jax.jit(jnp.mean)(batch["x"])
    got = float(jax.device_get(mean))
    # mean over (2 rows of 1.0) + (2 rows of 2.0) — wrong (1.0 or 2.0)
    # if a host only saw its own data
    assert abs(got - 1.5) < 1e-6, got

    # train.py's preemption agreement: SIGTERM lands on ONE host (here:
    # rank 1); the flag allgather must make BOTH hosts decide to
    # checkpoint at the same step (mismatched collective entry would
    # deadlock a real run)
    from jax.experimental import multihost_utils

    local_flag = np.asarray(pid == 1, np.int32)
    flags = multihost_utils.process_allgather(local_flag)
    agreed = bool(np.max(flags))
    assert agreed, (pid, flags)

    # multi-host device-resident feeding: both hosts build identical
    # replicated pools from a shared tiny wav dataset and iterate the
    # global index stream; each host's addressable output shard must
    # equal the rows its rank's host-fed epoch_batches slice would carry
    data_dir = os.environ.get("MBIV_MH_DATA")
    if data_dir:
        from mb_istft_vits_tpu.config import DataConfig
        from mb_istft_vits_tpu.data import (
            BucketedBatcher,
            DeviceResidentFeeder,
            TextAudioDataset,
        )

        filelist = os.path.join(data_dir, "train.txt")
        cfg = DataConfig(
            training_files=filelist, sampling_rate=8000,
            filter_length=256, hop_length=64, win_length=256,
            text_module="text_JP", cleaned_text=True, add_blank=True,
            max_wav_value=32768.0,
        )
        ds = TextAudioDataset(filelist, cfg, device_spec=True)
        batcher = BucketedBatcher(ds, batch_size=2, num_replicas=2,
                                  rank=pid, boundaries=[16, 128, 256, 512])
        feeder = DeviceResidentFeeder(batcher, mesh=mesh)
        host_batches = list(batcher.iter_epoch(0))
        n_checked = 0
        for bh, bd in zip(host_batches, feeder.iter_epoch(0)):
            for k, v in bh.items():
                arr = bd[k]
                # this host's rows of the global array, in shard order
                shards = sorted(
                    (s for s in arr.addressable_shards),
                    key=lambda s: s.index[0].start or 0)
                local_rows = np.concatenate(
                    [np.asarray(s.data) for s in shards])
                lo = pid * len(v)
                assert local_rows.shape == v.shape, (k, local_rows.shape)
                np.testing.assert_array_equal(local_rows, v, err_msg=k)
                del lo
                n_checked += 1
        assert n_checked > 0
        print(f"proc {pid}: resident ok ({n_checked} arrays)", flush=True)

    print(f"proc {pid}: ok global_mean={got} preempt_agreed={agreed}",
          flush=True)


if __name__ == "__main__":
    main()
