from eeg_gnn_tpu.graphs.supports import (  # noqa: F401
    normalized_laplacian,
    scaled_laplacian,
    random_walk,
    compute_supports,
    compute_supports_jnp,
    num_supports_for,
)
from eeg_gnn_tpu.graphs.xcorr import (  # noqa: F401
    correlation_adjacency,
    correlation_adjacency_jnp,
    keep_topk,
    keep_topk_jnp,
)
from eeg_gnn_tpu.graphs.distance import (  # noqa: F401
    load_distance_adjacency,
    build_distance_adjacency,
    swap_adjacency_nodes,
)
