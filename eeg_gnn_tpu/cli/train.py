"""Training entry point: ``python -m eeg_gnn_tpu.cli.train <flags>``.

Flag surface mirrors the reference's ``train.py``/``train_ssl.py`` (one
entry handles all tasks — the reference splits SSL into ``train_ssl.py``
with the same skeleton). Extra flags (``--marker_dir``, ``--adj_mat_dir``,
``--mesh_shape``, ``--dtype``) cover what the reference hard-codes.
"""

from __future__ import annotations

import json
import os
import sys


def main(argv=None):
    from eeg_gnn_tpu.config import build_parser, ExperimentConfig

    parser = build_parser()
    parser.add_argument("--marker_dir", type=str, default=None,
                        help="Dir with file markers + scaler pickles.")
    parser.add_argument("--adj_mat_dir", type=str, default=None,
                        help="Path to distance-graph adjacency pickle.")
    ns = parser.parse_args(argv)
    marker_dir = ns.marker_dir
    adj_mat_dir = ns.adj_mat_dir
    d = vars(ns)
    d.pop("marker_dir")
    d.pop("adj_mat_dir")
    cfg = ExperimentConfig(**d).finalize()

    import jax

    from eeg_gnn_tpu.parallel import distributed
    from eeg_gnn_tpu.utils.jax_setup import enable_compilation_cache

    # Multi-host runtime: no-op single-process; with JAX_COORDINATOR_ADDRESS
    # / JAX_NUM_PROCESSES / JAX_PROCESS_ID set (or on a Cloud TPU pod), the
    # mesh below spans every process's devices and the data loaders shard
    # per process (SURVEY.md §2.8).
    distributed.initialize()
    enable_compilation_cache()

    from eeg_gnn_tpu.data.datasets import (
        load_dataset_classification,
        load_dataset_detection,
        load_dataset_ssl,
    )
    from eeg_gnn_tpu.parallel.mesh import make_mesh
    from eeg_gnn_tpu.train.checkpoint import get_save_dir
    from eeg_gnn_tpu.train.trainer import run_experiment
    from eeg_gnn_tpu.utils.logging import MetricsWriter, get_logger

    save_dir = get_save_dir(cfg.save_dir or "./save", training=cfg.do_train)
    cfg.save_dir = save_dir
    with open(os.path.join(save_dir, "args.json"), "w") as f:
        f.write(cfg.to_json())
    log = get_logger(save_dir, "train")
    tbx = MetricsWriter(save_dir)
    log.info("Args: " + cfg.to_json())

    common = dict(
        input_dir=cfg.input_dir, raw_data_dir=cfg.raw_data_dir,
        train_batch_size=cfg.train_batch_size,
        test_batch_size=cfg.test_batch_size,
        time_step_size=cfg.time_step_size, standardize=True,
        num_workers=cfg.num_workers, augmentation=cfg.data_augment,
        adj_mat_dir=adj_mat_dir, graph_type=cfg.graph_type, top_k=cfg.top_k,
        filter_type=cfg.filter_type, use_fft=cfg.use_fft,
        preproc_dir=cfg.preproc_dir, marker_dir=marker_dir,
    )
    # DP mesh first (cache sizing/sharding depends on it): the data axis
    # must divide both batch sizes (batches are padded to those fixed
    # shapes). Shrink to the gcd; 1 device -> no mesh.
    import math

    n_dev = len(jax.devices())
    if jax.process_count() > 1:
        # multi-host meshes must span every process's devices
        for bs in (cfg.train_batch_size, cfg.test_batch_size):
            if bs % n_dev:
                raise ValueError(
                    f"batch size {bs} must divide the {n_dev} global devices "
                    "for multi-host training")
        mesh = make_mesh(f"data:{n_dev}")
    else:
        dp = math.gcd(math.gcd(n_dev, cfg.train_batch_size),
                      cfg.test_batch_size)
        mesh = make_mesh(f"data:{dp}", jax.devices()[:dp]) if dp > 1 else None

    use_device_pipeline = (
        cfg.device_pipeline
        and cfg.task in ("detection", "SS pre-training")
        and cfg.model_name == "dcrnn"
    )
    # All three task families cache, on BOTH graph types: classification's
    # correlation graph runs on the length-masked clip
    # (DevicePipeline.classification_features — exactly the reference's
    # unpadded whole-clip xcorr), closing the last task x graph cell of
    # the fast-path matrix (round 5)
    cache_task_ok = cfg.task in ("detection", "SS pre-training",
                                 "classification")
    # multi-host included (round 5): each process featurizes + uploads
    # only its row shard of the train split (data/device_cache.py:
    # _process_rows / make_array_from_process_local_data)
    use_hbm_cache = (
        cfg.hbm_cache
        and cfg.model_name == "dcrnn"
        and cache_task_ok
    )
    input_pipeline = None
    device_caches = None
    if cfg.task == "detection":
        loaders, _, scaler = load_dataset_detection(
            max_seq_len=cfg.max_seq_len, sampling_ratio=cfg.sampling_ratio,
            seed=123, raw_mode=use_device_pipeline, **common)
    elif cfg.task == "classification":
        if cfg.model_name == "densecnn":
            # reference train.py:92-106 switches to the flat-clip loader
            from eeg_gnn_tpu.data.datasets import (
                load_dataset_densecnn_classification,
            )

            loaders, _, scaler = load_dataset_densecnn_classification(
                input_dir=cfg.input_dir, raw_data_dir=cfg.raw_data_dir,
                train_batch_size=cfg.train_batch_size,
                test_batch_size=cfg.test_batch_size,
                max_seq_len=cfg.max_seq_len, standardize=True,
                num_workers=cfg.num_workers, padding_val=0.0,
                augmentation=cfg.data_augment, use_fft=cfg.use_fft,
                preproc_dir=cfg.preproc_dir, marker_dir=marker_dir)
        else:
            loaders, _, scaler = load_dataset_classification(
                max_seq_len=cfg.max_seq_len, padding_val=0.0, **common)
    else:  # SS pre-training
        loaders, _, scaler = load_dataset_ssl(
            input_len=cfg.max_seq_len, output_len=cfg.output_seq_len,
            raw_mode=use_device_pipeline, **common)

    if use_device_pipeline or use_hbm_cache:
        from eeg_gnn_tpu.data.device_pipeline import make_device_pipeline

        # --reflect_invariant (its own flag; a documented numerics
        # divergence, NOT implied by --hbm_cache) opts into
        # reflection-as-true-relabeling: shared supports — see
        # DIVERGENCES.md "Reflection-invariant supports"
        input_pipeline = make_device_pipeline(
            graph_type=cfg.graph_type, filter_type=cfg.filter_type,
            top_k=cfg.top_k, use_fft=cfg.use_fft,
            time_step_size=cfg.time_step_size, scaler=scaler,
            augment=cfg.data_augment, adj_mat_dir=adj_mat_dir,
            num_nodes=cfg.num_nodes,
            reflect_invariant=cfg.reflect_invariant)

    if use_hbm_cache:
        # HBM-resident splits: featurize once on host (plain clips —
        # augment/standardize/graphs run on device per step), upload
        # once, gather per step (data/device_cache.py). With a mesh only
        # the train split caches (row-sharded in the trainer; eval
        # streams), and the HBM budget scales with the data-axis size.
        from eeg_gnn_tpu.data.device_cache import (
            build_classification_cache,
            build_detection_cache,
            build_ssl_cache,
            fits_in_hbm,
        )

        plain_common = dict(
            input_dir=cfg.input_dir, raw_data_dir=cfg.raw_data_dir,
            train_batch_size=cfg.train_batch_size,
            test_batch_size=cfg.test_batch_size,
            time_step_size=cfg.time_step_size, standardize=False,
            num_workers=cfg.num_workers, augmentation=False,
            adj_mat_dir=None, graph_type=None, use_fft=cfg.use_fft,
            preproc_dir=cfg.preproc_dir, marker_dir=marker_dir,
            build_loaders=False)
        storage = "bfloat16" if cfg.dtype == "bfloat16" else "float32"
        t_out = 0
        if cfg.task == "detection":
            _, plain, _ = load_dataset_detection(
                max_seq_len=cfg.max_seq_len,
                sampling_ratio=cfg.sampling_ratio, seed=123,
                **plain_common)

            def build(ds):
                return build_detection_cache(
                    ds, cfg.max_seq_len, storage_dtype=storage,
                    num_workers=cfg.num_workers, mesh=mesh)
        elif cfg.task == "SS pre-training":
            t_out = cfg.output_seq_len
            _, plain, _ = load_dataset_ssl(
                input_len=cfg.max_seq_len, output_len=cfg.output_seq_len,
                **plain_common)

            def build(ds):
                return build_ssl_cache(
                    ds, cfg.max_seq_len, storage_dtype=storage,
                    num_workers=cfg.num_workers, mesh=mesh)
        else:
            _, plain, _ = load_dataset_classification(
                max_seq_len=cfg.max_seq_len, padding_val=0.0,
                **plain_common)

            def build(ds):
                return build_classification_cache(
                    ds, cfg.max_seq_len, storage_dtype=storage,
                    num_workers=cfg.num_workers, mesh=mesh)

        cache_splits = ["train"] if mesh is not None else list(plain)
        n_total = sum(len(plain[s]) for s in cache_splits)
        n_dev_cache = mesh.shape["data"] if mesh is not None else 1
        budget = int(cfg.hbm_budget_gb * 2 ** 30)
        if fits_in_hbm(n_total, cfg.max_seq_len, cfg.num_nodes,
                       cfg.input_dim, storage, t_out=t_out,
                       budget_bytes=budget, num_devices=n_dev_cache):
            device_caches = {s: build(plain[s]) for s in cache_splits}
        else:
            # beyond-HBM: chunked rotating cache — fixed-shape shards
            # double-buffered through HBM, upload overlapped with steps
            # (data/rotating_cache.py; replaces the round-3 silent
            # streaming cliff). With a mesh the slabs are row-sharded
            # over the data axis (per-device budget unchanged); on
            # multi-host runs each process featurizes + uploads only its
            # per-shard row stripes.
            from eeg_gnn_tpu.data.rotating_cache import build_rotating_cache

            kind = {"detection": "detection", "SS pre-training": "ssl",
                    "classification": "classification"}[cfg.task]
            device_caches = {
                s: build_rotating_cache(
                    plain[s], cfg.max_seq_len, kind, storage_dtype=storage,
                    budget_bytes=budget,
                    num_workers=cfg.num_workers, mesh=mesh)
                for s in cache_splits
            }
            print("hbm_cache: split exceeds the HBM budget; using the "
                  "chunked rotating cache "
                  f"({device_caches['train'].num_shards} shards, "
                  "double-buffered H2D"
                  + (", row-sharded slabs" if mesh is not None else "")
                  + ")", file=sys.stderr)
    results = run_experiment(cfg, loaders, scaler, save_dir, log, tbx,
                             mesh=mesh, input_pipeline=input_pipeline,
                             device_caches=device_caches)
    with open(os.path.join(save_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
