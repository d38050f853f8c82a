from sceneverse_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    get_mesh,
    make_mesh,
    mesh_from_cfg,
    replicated,
    shard_batch,
    shard_module,
)
