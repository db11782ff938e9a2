"""Subprocess worker for the 2-process jax.distributed CPU test.

Usage: python tests/multihost_worker.py <coordinator> <nprocs> <pid> <data> <out.json>

Each process initializes jax.distributed, trains the same config (streaming
its own byte-range of the file — ftrl_ffm_tpu.data.loader.process_byte_range)
and dumps its loss history as JSON.
"""

import json
import sys


def main() -> None:
    coord, nprocs, pid, data, out = sys.argv[1:6]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nprocs),
        process_id=int(pid),
    )

    from ftrl_ffm_tpu.config import Config
    from ftrl_ffm_tpu.train import Trainer

    cfg = Config(
        train_data=data,
        eval_data=data,
        model_type="FFM",
        n_fields=4,
        n_feats=50,
        n_factors=4,
        batch_size=256,
        n_epochs=2,
        online=True,
    )
    tr = Trainer(cfg)
    hist = tr.train()
    with open(out, "w") as f:
        json.dump(
            {
                **hist,
                "process_count": jax.process_count(),
                "device_count": jax.device_count(),
                "local_device_count": jax.local_device_count(),
            },
            f,
        )


if __name__ == "__main__":
    main()
