"""Graph viz smoke test (reference graph_viz_utils parity surface)."""

import os

import numpy as np
import pytest

from conftest import reference_available

ADJ_PKL = "/root/reference/data/electrode_graph/adj_mx_3d.pkl"


@pytest.mark.skipif(not reference_available(), reason="no reference mount")
def test_graph_viz_renders(tmp_path):
    from eeg_gnn_tpu.graphs import load_distance_adjacency
    from eeg_gnn_tpu.viz.graph_viz import (
        draw_graph_weighted_edge,
        get_spectral_graph_positions,
    )

    pos = get_spectral_graph_positions(ADJ_PKL)
    adj = load_distance_adjacency(ADJ_PKL)
    out = str(tmp_path / "graph.png")
    fig = draw_graph_weighted_edge(adj, pos, title="distance graph",
                                   save_path=out)
    assert fig is not None
    assert os.path.getsize(out) > 10000  # non-trivial png


@pytest.mark.skipif(not reference_available(), reason="no reference mount")
def test_spectral_positions_scalp_rotation():
    """Positions must be the reference's rotated layout (graph_viz_utils.py:41):
    spectral_layout of the self-edge-free graph, then (x, y) -> (y, -x)."""
    import networkx as nx

    from eeg_gnn_tpu.graphs import load_distance_adjacency
    from eeg_gnn_tpu.viz.graph_viz import get_spectral_graph_positions

    pos = get_spectral_graph_positions(ADJ_PKL)
    adj = load_distance_adjacency(ADJ_PKL)

    g = nx.Graph()
    for i in range(adj.shape[0]):
        g.add_node(i)
    for i in range(adj.shape[0]):
        for j in range(adj.shape[1]):
            if i != j and adj[i, j] > 0:
                g.add_edge(i, j)
    raw = nx.spectral_layout(g)

    assert set(pos) == set(raw)
    for node, (x, y) in raw.items():
        np.testing.assert_allclose(pos[node], (y, -x), atol=1e-12)
