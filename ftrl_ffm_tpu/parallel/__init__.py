"""Multi-device / multi-host scaling for ftrl_ffm_tpu.

The reference is a single process with hogwild threads + per-row mutexes
(reference: src/task/ftrl_online.cpp:70-80, src/include/model/ftrl_model.h:49).
Here scaling is a `jax.sharding.Mesh` over two logical axes:

  * "data"  — the global batch is row-sharded (classic DP),
  * "model" — the feature tables ((n, z, w) triples) are row-sharded with
    modulo-interleaved (hash-equivalent) feature-id placement — the
    parameter-server analogue.

Collectives (all XLA, riding ICI): `all_to_all` id/row/grad routing between
batch shards and table shards (lookup_mode="route", the scalable form), or a
`psum`-combine over "model" (lookup_mode="replicate", small meshes); dense
per-feature gradient accumulators `psum` over "data".  See sharded.py.
"""

from ftrl_ffm_tpu.parallel.mesh import make_mesh, shard_state, unshard_state
from ftrl_ffm_tpu.parallel.sharded import ShardedStep

__all__ = ["make_mesh", "shard_state", "unshard_state", "ShardedStep"]
