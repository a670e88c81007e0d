from dkt_stereo_tpu.parallel.mesh import (
    batch_sharding,
    cross_replica_batch_stats,
    initialize_multihost,
    make_mesh,
    replicate,
    shard_batch,
)
