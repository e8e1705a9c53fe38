"""Subprocess worker for the 2-process multi-host test.

Each worker is one "host": it initializes jax.distributed against a local
coordinator, gets 4 virtual CPU devices (XLA_FLAGS set by the launcher), and
runs the REAL `fit()` end-to-end — globally sharded pool, GSPMD step over the
8-device cross-process mesh, process-0-gated logging, collective Orbax
checkpointing. The launcher (tests/test_multihost.py) then compares the final
checkpoint against a single-process run of the same config.

Usage: python tests/multihost_worker.py <pid> <nprocs> <port> <scene> <out>
"""

import json
import os
import sys

# repo-root import without PYTHONPATH (env-var path injection can break
# platform plugin registration on some runtimes)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, scene_dir, out_dir = sys.argv[3], sys.argv[4], sys.argv[5]

    import jax

    from nerf_tpu.parallel.multihost import init_distributed, is_primary

    init_distributed(f"localhost:{port}", nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 4 * nprocs, jax.device_count()
    assert len(jax.local_devices()) == 4

    from nerf_tpu.config import Config
    from nerf_tpu.data.pipeline import load_scene
    from nerf_tpu.parallel.mesh import create_mesh, data_sharding
    from nerf_tpu.train.loop import fit

    cfg = Config(
        dataset_path=scene_dir,
        num_random_rays=64,
        num_samples=4,
        hidden_dim=32,
        pos_encoding_dim=2,
        dir_encoding_dim=1,
        model_type="nerf",
        use_pallas=False,
        donate_state=False,
        multihost=True,
        log_interval=4,
        val_interval=4,   # exercises the multihost validation/allgather path
        save_interval=100,
        num_iters=8,
        save_path=out_dir,
        log_dir=os.path.join(out_dir, "logs"),
    )

    # the pool must be globally sharded: every device holds M/8 rays
    mesh = create_mesh()
    probe = load_scene(cfg, sharding=data_sharding(mesh))
    shard_rows = {
        s.data.shape[0] for s in probe.pool.rays_o.addressable_shards
    }
    total = probe.pool.rays_o.shape[0]
    assert shard_rows == {total // 8}, (shard_rows, total)

    state = fit(cfg, max_steps=8, enable_tensorboard=False)
    assert int(state.step) == 8

    if is_primary():
        with open(os.path.join(out_dir, "worker_ok.json"), "w") as f:
            json.dump({"step": int(state.step), "procs": nprocs}, f)


if __name__ == "__main__":
    main()
