#!/bin/bash
# TPU-native recipe of record: cnnlstm (mirrors the reference's hyperparameters;
# see configs/README.md for the required env vars)
set -e
python -m eeg_gnn_tpu.cli.train \
    --input_dir "$INPUT_DIR" \
    --raw_data_dir "$RAW_DATA_DIR" \
    --marker_dir "$MARKER_DIR" \
    --adj_mat_dir "$ADJ_MAT_DIR" \
    --save_dir "$SAVE_DIR" \
    --do_train \
    --use_fft \
    --data_augment \
    --model_name cnnlstm --task detection --max_seq_len 60 --num_epochs 100 --metric_name auroc --lr_init 1e-4 --num_classes 1
