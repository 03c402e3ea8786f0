from crfr.parallel.mesh import (  # noqa: F401
    MeshCfg,
    batch_sharding,
    class_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
