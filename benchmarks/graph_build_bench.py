"""Graph-build crossover study: dense Gram vs sparse (SDDMM / segment-sum)
at synthetic montage sizes N in {19, 64, 128, 256, 512, 1024}.

Three questions (VERDICT r2 #7 + the perf plan's named SDDMM):

1. *Build* (topology unknown): the correlation-graph build needs all-pairs
   scores for top-k — dense Gram + top-k, measured per N.
2. *Re-score* (topology known, e.g. periodic refresh of a fixed top-k
   graph): dense Gram vs edge-list SDDMM vs block-sparse Pallas SDDMM.
   Where is the crossover?
3. *Apply* (diffusion support matmul): dense batched matmul vs
   segment-sum sparse SpMM per N — where does sparse win?

Writes benchmarks/graph_build_results.json.
Run alone (2-CPU host: concurrent work skews TPU timings).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _root not in sys.path:
    sys.path.insert(0, _root)


def _sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def _time(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from eeg_gnn_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from eeg_gnn_tpu.graphs.sparse import from_dense_batch, spmm
    from eeg_gnn_tpu.graphs.xcorr import correlation_adjacency_jnp, keep_topk
    from eeg_gnn_tpu.ops.sddmm import (
        edges_to_blocks,
        sddmm_blocksparse,
        sddmm_edges,
    )

    rng = np.random.RandomState(0)
    d_sig = 6000      # flattened clip signal length (60 s x 100-dim FFT)
    feat_d = 128      # diffusion-conv feature width for the apply study
    top_k = 3
    results = {"config": {"signal_dim": d_sig, "top_k": top_k,
                          "apply_feat_dim": feat_d,
                          "device": str(jax.devices()[0])},
               "montages": []}

    for n, topo in ((19, "topk"), (64, "topk"), (128, "topk"),
                    (256, "topk"), (512, "topk"), (1024, "topk"),
                    (4096, "topk"), (4096, "banded")):
        entry = {"n": n, "topology": topo}
        x = rng.randn(n, d_sig).astype(np.float32)
        xd = jnp.asarray(x)

        # --- 1. build: dense Gram + top-k (the only way to rank all pairs)
        clip = x.reshape(1, -1, n, 1).transpose(0, 2, 1, 3)  # fake clip axes
        clip = jnp.asarray(np.transpose(clip, (0, 2, 1, 3)))  # (1, T, N, D)
        f_build = jax.jit(lambda c: correlation_adjacency_jnp(c, top_k=top_k))
        entry["dense_build_ms"] = _time(f_build, clip) * 1e3

        # fixed topology for the re-score study
        if topo == "banded":
            # spatially-clustered graph (electrodes sorted by position):
            # neighbors within +-32 indices — the block-occupancy regime
            # where sampled (sparse) scoring actually skips work
            half = 32
            rows = np.repeat(np.arange(n), 2 * half)
            offs = np.concatenate([np.arange(-half, 0), np.arange(1, half + 1)])
            cols = (rows.reshape(n, 2 * half) + offs).reshape(-1) % n
            adj_k = None
        else:
            adj = np.abs(x @ x.T)
            adj_k = keep_topk(adj, top_k=top_k, directed=True)
            rows, cols = np.nonzero(adj_k * (1 - np.eye(n)))
        rows = rows.astype(np.int32)
        cols = cols.astype(np.int32)
        entry["edges"] = int(rows.size)

        # --- 2a. re-score via full dense Gram (then sample)
        f_gram = jax.jit(lambda v: jnp.einsum(
            "nd,md->nm", v, v, preferred_element_type=jnp.float32))
        entry["dense_rescore_ms"] = _time(f_gram, xd) * 1e3

        # --- 2b. edge-list SDDMM
        rj, cj = jnp.asarray(rows), jnp.asarray(cols)
        f_edge = jax.jit(lambda v: sddmm_edges(rj, cj, v, v))
        entry["sddmm_edges_ms"] = _time(f_edge, xd) * 1e3

        # --- 2c. block-sparse Pallas SDDMM
        brows, bcols, _, _ = edges_to_blocks(rows, cols, n, 128)
        entry["occupied_blocks"] = int(brows.size)
        entry["total_blocks"] = int(((n + 127) // 128) ** 2)
        try:
            bj, cj2 = jnp.asarray(brows), jnp.asarray(bcols)
            f_blk = jax.jit(lambda v: sddmm_blocksparse(v, v, bj, cj2))
            entry["sddmm_blocksparse_ms"] = _time(f_blk, xd) * 1e3
        except Exception as e:  # pragma: no cover - hardware-specific
            entry["sddmm_blocksparse_error"] = str(e)[:200]

        # --- 3. apply: dense batched support matmul vs segment-sum SpMM
        if adj_k is not None:
            b_apply = max(1, 4096 // n)  # clips/batch, ~constant total nodes
            entry["apply_batch"] = b_apply
            sup = np.stack(
                [adj_k / np.maximum(adj_k.sum(1, keepdims=True), 1e-8)
                 for _ in range(b_apply)]).astype(np.float32)
            feats = rng.randn(b_apply, n, feat_d).astype(np.float32)
            supd, featd = jnp.asarray(sup), jnp.asarray(feats)
            f_dense = jax.jit(lambda s, v: jnp.einsum(
                "bnm,bmd->bnd", s, v, preferred_element_type=jnp.float32))
            entry["dense_apply_ms"] = _time(f_dense, supd, featd) * 1e3

            g = from_dense_batch(jnp.asarray(sup))
            flat = jnp.asarray(feats.reshape(b_apply * n, feat_d))
            f_sp = jax.jit(lambda v, x_: spmm(
                type(g)(g.rows, g.cols, v, g.num_nodes), x_))
            entry["sparse_apply_ms"] = _time(f_sp, g.values, flat) * 1e3

        results["montages"].append(entry)
        print(json.dumps(entry))

    # crossover summary — require a 1.2x margin so the ~1 ms dispatch
    # latency floor on this host can't manufacture noise "wins"
    def first_win(key_sparse, key_dense, margin=1.2):
        for e in results["montages"]:
            if (key_sparse in e and key_dense in e
                    and e[key_sparse] * margin < e[key_dense]):
                return {"n": e["n"], "topology": e["topology"]}
        return None

    results["crossover"] = {
        "sddmm_edges_beats_dense_rescore":
            first_win("sddmm_edges_ms", "dense_rescore_ms"),
        "sddmm_blocksparse_beats_dense_rescore":
            first_win("sddmm_blocksparse_ms", "dense_rescore_ms"),
        "sparse_apply_beats_dense":
            first_win("sparse_apply_ms", "dense_apply_ms"),
    }

    out_path = os.path.join(os.path.dirname(__file__),
                            "graph_build_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["crossover"], indent=2))


if __name__ == "__main__":
    main()
