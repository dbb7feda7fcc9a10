#!/bin/sh
# Visual-prompt-only baseline (reference run_onlyvis_train.sh): LM loss only,
# no face/NER streams (`only_image`), retrieval toggled via data.use_retrieval.
set -e
DATADIR=${DATADIR:?set DATADIR}
OUTDIR=${OUTDIR:?set OUTDIR}
VOCAB=${VOCAB:?path to BART vocab.json}
MERGES=${MERGES:?path to BART merges.txt}

python -m vacnic_tpu.cli train \
  --config onlyvis \
  --data-dir "$DATADIR" \
  --out-dir "$OUTDIR" \
  --vocab "$VOCAB" --merges "$MERGES" \
  --set train.alpha=0 --set train.no_mapping=true \
  "$@"
