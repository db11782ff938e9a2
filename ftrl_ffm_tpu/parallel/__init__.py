"""Multi-device / multi-host scaling for ftrl_ffm_tpu.

The reference is a single process with hogwild threads + per-row mutexes
(reference: src/task/ftrl_online.cpp:70-80, src/include/model/ftrl_model.h:49).
Here scaling is a `jax.sharding.Mesh` over two logical axes:

  * "data"  — the global batch is row-sharded (classic DP),
  * "model" — the feature tables (lin/vec n,z accumulators) are row-sharded
    by contiguous feature-id block (the parameter-server analogue).

Collectives (all XLA, riding ICI): table-lookup combine is a `psum` over
"model"; per-feature gradient aggregation `all_gather`s ids+grads over "data"
so each table shard applies one deterministic FTRL step to its rows.
"""

from ftrl_ffm_tpu.parallel.mesh import make_mesh, shard_state
from ftrl_ffm_tpu.parallel.sharded import ShardedStep

__all__ = ["make_mesh", "shard_state", "ShardedStep"]
