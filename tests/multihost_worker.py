"""Subprocess worker for the 2-process jax.distributed CPU test.

Usage: python tests/multihost_worker.py <coordinator> <nprocs> <pid> <data>
           <out.json> [mesh_model] [lookup_mode] [ckpt_path] [pred_path]
           [n_epochs]

Each process initializes jax.distributed, trains the same config (streaming
its own byte-range of the file — ftrl_ffm_tpu.data.loader.process_byte_range)
and dumps its loss history as JSON.  Optional mesh_model/lookup_mode select
the production shape: row-sharded tables + all_to_all routed lookups over a
mesh that spans both processes.
"""

import json
import sys


def main() -> None:
    coord, nprocs, pid, data, out = sys.argv[1:6]
    mesh_model = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    lookup_mode = sys.argv[7] if len(sys.argv) > 7 else "auto"
    ckpt_path = sys.argv[8] if len(sys.argv) > 8 else ""
    pred_path = sys.argv[9] if len(sys.argv) > 9 else ""
    n_epochs = int(sys.argv[10]) if len(sys.argv) > 10 else 2
    model_type = sys.argv[11] if len(sys.argv) > 11 else "FFM"
    update_mode = sys.argv[12] if len(sys.argv) > 12 else "auto"
    online = (sys.argv[13] == "1") if len(sys.argv) > 13 else True
    # default "off": most multihost tests pin the STREAMED byte-range path
    # (dynamic compact transfer, route lookups over live uploads); the
    # cached tiers are exercised by the explicit device_cache="on" tests
    device_cache = sys.argv[14] if len(sys.argv) > 14 else "off"
    shuffle = (sys.argv[15] == "1") if len(sys.argv) > 15 else True
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
        model_type=model_type,
        n_fields=4,
        n_feats=50,
        n_factors=4,
        batch_size=256,
        n_epochs=n_epochs,
        online=online,
        device_cache=device_cache,
        shuffle=shuffle,
        # mesh_data=0: span ALL global devices (both processes) on the data
        # axis — make_mesh resolves 0 to device_count // mesh_model
        mesh_data=0 if mesh_model > 1 else 1,
        mesh_model=mesh_model,
        lookup_mode=lookup_mode,
        update_mode=update_mode,
    )
    tr = Trainer(cfg)
    # n_epochs=0: predict-only mode (deterministic init state — bitwise
    # comparable across process counts)
    hist = tr.train() if n_epochs > 0 else {"train_loss": []}
    if ckpt_path:
        # multi-host checkpoint: every process joins the state allgather,
        # only the coordinator writes (train.py::save_checkpoint)
        tr.save_checkpoint(ckpt_path)
    if pred_path:
        # ordered multi-host scoring: all processes participate, the
        # coordinator writes the (byte-identical) prediction file
        tr.predict_file(data, pred_path)
    agreed = {
        role: {
            k: (v.tolist() if hasattr(v, "tolist") else v)
            for k, v in d.items()
        }
        for role, d in tr._dyn_agreed.items()
    }
    with open(out, "w") as f:
        json.dump(
            {
                **hist,
                "process_count": jax.process_count(),
                "device_count": jax.device_count(),
                "local_device_count": jax.local_device_count(),
                "compact_agreed": agreed,
                "device_cache": {
                    role: (e.layout if e is not None else "streamed")
                    for role, e in tr._dev_cache.items()
                },
            },
            f,
        )


if __name__ == "__main__":
    main()
