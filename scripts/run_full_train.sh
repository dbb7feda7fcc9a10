#!/bin/sh
# Full-model training — the released configuration (reference run_full_train.sh):
# BART-large, CLIP ViT-B/16 CLS prompt (clipcap, P=20), fusion at all 12
# encoder layers, SECLA + CoLaM (alpha 0.5, margin 1.0), batch 32, 16 epochs,
# lr 3e-5, warmup 5%, seed 684331. All values are preset defaults of
# `--config full`; flags here only point at data and outputs.
set -e
DATADIR=${DATADIR:?set DATADIR to the GoodNews/NYTimes root}
OUTDIR=${OUTDIR:?set OUTDIR for checkpoints and logs}
VOCAB=${VOCAB:?path to BART vocab.json}
MERGES=${MERGES:?path to BART merges.txt}

python -m vacnic_tpu.cli train \
  --config full \
  --data-dir "$DATADIR" \
  --out-dir "$OUTDIR" \
  --vocab "$VOCAB" --merges "$MERGES" \
  --set data.dataset=goodnews \
  "$@"
