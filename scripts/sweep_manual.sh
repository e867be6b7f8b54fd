#!/usr/bin/env bash
# Manual hyperparameter sweep over the DINO loss knobs
# (counterpart of the reference's src/open_clip/sweep_manual.sh:19-49, which
# submits to a SLURM-ish sumbit.sh; here each combo runs sequentially or via
# $LAUNCHER, e.g. LAUNCHER="sbatch run_one.sh").
set -euo pipefail

MODEL=${MODEL:-ViT-B-16}
TRAIN_DATA=${TRAIN_DATA:?set TRAIN_DATA=/path/train.csv}
VAL_DATA=${VAL_DATA:?set VAL_DATA=/path/val.csv}
DINO_FTS=${DINO_FTS:?set DINO_FTS=/path/dino_feats.pt}
DINO_MAP=${DINO_MAP:?set DINO_MAP=/path/dino_index_map.pt}
EPOCHS=${EPOCHS:-8}
BATCH=${BATCH:-128}
LAUNCHER=${LAUNCHER:-}

for LAMBDA_SOFT in 0.3 0.5 0.7; do
  for TEACHER_TEMP in 0.10 0.15; do
    for LAMBDA_WEIGHTED in 0.0 0.3; do
      NAME="sweep-ls${LAMBDA_SOFT}-tt${TEACHER_TEMP}-lw${LAMBDA_WEIGHTED}"
      CMD=(python -m refining_clip_via_dinov2_representations_tpu.train.main
        --model "$MODEL" --pretrained openai
        --train-data "$TRAIN_DATA" --val-data "$VAL_DATA"
        --dataset-type csv --batch-size "$BATCH" --epochs "$EPOCHS"
        --use_dino_general --soft_mode kl_teacher
        --lambda_soft "$LAMBDA_SOFT" --teacher_temp "$TEACHER_TEMP"
        --lambda_weighted "$LAMBDA_WEIGHTED"
        --dino_fts_path "$DINO_FTS" --dino_index_map_path "$DINO_MAP"
        --name "$NAME")
      echo ">>> $NAME"
      if [ -n "$LAUNCHER" ]; then
        $LAUNCHER "${CMD[@]}"
      else
        "${CMD[@]}"
      fi
    done
  done
done
