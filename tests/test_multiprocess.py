"""Multi-host training test: two real ``jax.distributed`` processes on
localhost (CPU collectives over Gloo), each owning 2 virtual devices of a
4-device global mesh, drive the full CLI train flow end-to-end and must
reproduce the single-process result (same global batches, same seeds; the
per-process loaders each materialize half of every global batch).

Greenfield capability — the reference is single-process by design
(SURVEY.md §2.7/§2.8).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    rank, port, root = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    tag = sys.argv[4]
    extra = sys.argv[5:]
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(rank)
    sys.path.insert(0, %r)
    from eeg_gnn_tpu.cli.train import main
    with open(os.path.join(root, "paths.json")) as f:
        p = json.load(f)
    res = main([
        "--task", "detection", "--do_train", "--graph_type", "combined",
        "--max_seq_len", "12", "--use_fft", "--num_rnn_layers", "1",
        "--rnn_units", "16", "--max_diffusion_step", "1",
        "--train_batch_size", "4", "--test_batch_size", "4",
        "--num_epochs", "2", "--num_workers", "0",
        "--input_dir", p["input_dir"], "--raw_data_dir", p["raw_data_dir"],
        "--marker_dir", p["marker_dir"], "--adj_mat_dir", p["adj_mat_dir"],
        "--save_dir", os.path.join(root, f"save_mp_{tag}_{rank}"),
    ] + extra)
    with open(os.path.join(root, f"result_{tag}_{rank}.json"), "w") as f:
        json.dump({k: float(v) for k, v in res.items()}, f)
""" % (REPO,))


def _run_two_process(root, tag, extra=()):
    """Launch two jax.distributed worker processes; returns their result
    dicts (asserts both exit 0)."""
    worker = os.path.join(root, "worker.py")
    with open(worker, "w") as f:
        f.write(WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), port, root, tag] +
            list(extra),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for rank in (0, 1)
    ]
    outs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=900)
        outs.append(out)
    for rank, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
    results = []
    for rank in (0, 1):
        with open(os.path.join(root, f"result_{tag}_{rank}.json")) as f:
            results.append(json.load(f))
    return results, outs


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_matches_single(tmp_path):
    from eeg_gnn_tpu.cli.train import main
    from eeg_gnn_tpu.data.synthetic import make_synthetic_corpus

    root = str(tmp_path)
    p = make_synthetic_corpus(root, num_files=4, file_seconds=60, clip_len=12)
    with open(os.path.join(root, "paths.json"), "w") as f:
        json.dump(p, f)

    # single-process baseline (in-process, 8 virtual devices -> data:4 mesh)
    single = main([
        "--task", "detection", "--do_train", "--graph_type", "combined",
        "--max_seq_len", "12", "--use_fft", "--num_rnn_layers", "1",
        "--rnn_units", "16", "--max_diffusion_step", "1",
        "--train_batch_size", "4", "--test_batch_size", "4",
        "--num_epochs", "2", "--num_workers", "0",
        "--input_dir", p["input_dir"], "--raw_data_dir", p["raw_data_dir"],
        "--marker_dir", p["marker_dir"], "--adj_mat_dir", p["adj_mat_dir"],
        "--save_dir", os.path.join(root, "save_single"),
    ])

    # two real jax.distributed processes
    results, _ = _run_two_process(root, "stream")

    # both processes computed identical global metrics...
    for k, v in results[0].items():
        np.testing.assert_allclose(results[1][k], v, rtol=1e-6, err_msg=k)
    # ...matching the single-process run (same global batches and seeds;
    # tolerance covers cross-process reduction-order float differences)
    np.testing.assert_allclose(results[0]["loss"], single["loss"],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(results[0]["acc"], single["acc"], atol=1e-6)
    assert np.isfinite(results[0]["auroc"])
    np.testing.assert_allclose(results[0]["auroc"], single["auroc"],
                               atol=5e-3)


@pytest.mark.slow
def test_two_process_hbm_cache_matches_single(tmp_path):
    """VERDICT r4 #2 (pod-scale input pipeline): two real jax.distributed
    processes with ``--hbm_cache`` — each featurizes and uploads ONLY its
    row shard of the train split (no process ever holds the whole split)
    — must reproduce the single-process mesh-cached run: both use a
    4-device global data mesh with the same seeded shard-local epoch
    plans, so the global batch composition is identical."""
    from eeg_gnn_tpu.cli.train import main
    from eeg_gnn_tpu.data.synthetic import make_synthetic_corpus

    root = str(tmp_path)
    p = make_synthetic_corpus(root, num_files=4, file_seconds=60,
                              clip_len=12)
    with open(os.path.join(root, "paths.json"), "w") as f:
        json.dump(p, f)

    args = [
        "--task", "detection", "--do_train", "--graph_type", "combined",
        "--max_seq_len", "12", "--use_fft", "--num_rnn_layers", "1",
        "--rnn_units", "16", "--max_diffusion_step", "1",
        "--train_batch_size", "4", "--test_batch_size", "4",
        "--num_epochs", "2", "--num_workers", "0",
        "--input_dir", p["input_dir"], "--raw_data_dir", p["raw_data_dir"],
        "--marker_dir", p["marker_dir"], "--adj_mat_dir", p["adj_mat_dir"],
        "--hbm_cache",
    ]
    # single-process baseline: conftest's 8 virtual devices -> the same
    # global data:4 mesh the two-process run builds, mesh-cached train
    single = main(args + ["--save_dir", os.path.join(root, "save_single")])

    results, outs = _run_two_process(root, "hbm", extra=["--hbm_cache"])
    for k, v in results[0].items():
        np.testing.assert_allclose(results[1][k], v, rtol=1e-6, err_msg=k)
    np.testing.assert_allclose(results[0]["loss"], single["loss"],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(results[0]["acc"], single["acc"], atol=1e-6)
    np.testing.assert_allclose(results[0]["auroc"], single["auroc"],
                               atol=5e-3)


@pytest.mark.slow
def test_two_process_rotating_cache_matches_single(tmp_path):
    """Beyond-HBM x multi-host (the last cache-matrix cell): a tiny
    --hbm_budget_gb forces the rotating path; two real jax.distributed
    processes — each featurizing and uploading only its per-shard row
    STRIPES — must reproduce the single-process mesh-rotating run (same
    4-device global mesh, same seeded shard order and per-slab plans)."""
    from eeg_gnn_tpu.cli.train import main
    from eeg_gnn_tpu.data.synthetic import make_synthetic_corpus

    root = str(tmp_path)
    p = make_synthetic_corpus(root, num_files=4, file_seconds=60,
                              clip_len=12)
    with open(os.path.join(root, "paths.json"), "w") as f:
        json.dump(p, f)

    args = [
        "--task", "detection", "--do_train", "--graph_type", "combined",
        "--max_seq_len", "12", "--use_fft", "--num_rnn_layers", "1",
        "--rnn_units", "16", "--max_diffusion_step", "1",
        "--train_batch_size", "4", "--test_batch_size", "4",
        "--num_epochs", "2", "--num_workers", "0",
        "--input_dir", p["input_dir"], "--raw_data_dir", p["raw_data_dir"],
        "--marker_dir", p["marker_dir"], "--adj_mat_dir", p["adj_mat_dir"],
        "--hbm_cache", "--hbm_budget_gb", "0.0002",
    ]
    single = main(args + ["--save_dir", os.path.join(root, "save_single")])

    results, outs = _run_two_process(
        root, "rot", extra=["--hbm_cache", "--hbm_budget_gb", "0.0002"])
    # the rotating path really engaged on both sides
    assert "chunked rotating cache" in outs[0]
    for k, v in results[0].items():
        np.testing.assert_allclose(results[1][k], v, rtol=1e-6, err_msg=k)
    np.testing.assert_allclose(results[0]["loss"], single["loss"],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(results[0]["acc"], single["acc"], atol=1e-6)
    np.testing.assert_allclose(results[0]["auroc"], single["auroc"],
                               atol=5e-3)
