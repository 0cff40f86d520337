"""Parallelism: device meshes, graph partitioning, sharded graph shifts.

The reference is single-process/single-device (SURVEY.md §2.9); this
package is new, TPU-native capability:

  * ``mesh``      -- ('data', 'graph') logical mesh helpers,
  * ``partition`` -- host-side node partitioner (contiguous blocks after a
    locality ordering) + halo metadata,
  * ``shift``     -- sharded SpMM paths: GSPMD (annotate + let XLA insert
    collectives), explicit all-gather shard_map, and a ring halo-exchange
    shard_map for banded partitions; data-parallel training utilities.
"""

from graph_neural_networks_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, data_sharding, replicated)
from graph_neural_networks_tpu.parallel.partition import (  # noqa: F401
    partition_nodes, partition_nodes_bcsr, GraphPartition,
    BcsrPartition)
from graph_neural_networks_tpu.parallel.shift import (  # noqa: F401
    sharded_gshift_allgather, sharded_gshift_ring,
    sharded_gshift_bcsr, make_dp_train_step)
from graph_neural_networks_tpu.parallel.sharded_gso import ShardedGso  # noqa: F401
from graph_neural_networks_tpu.parallel.db import (  # noqa: F401
    ShardedEllGso, shard_ell)
from graph_neural_networks_tpu.parallel.swarm import (  # noqa: F401
    sharded_env_step, sharded_swarm_rollout, pad_swarm)
