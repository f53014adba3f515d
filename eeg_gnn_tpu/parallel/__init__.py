from eeg_gnn_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    parse_mesh_shape,
    batch_sharding,
    replicated_sharding,
)
