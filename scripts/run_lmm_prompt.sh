#!/bin/sh
# LMM zero-shot prompting baselines (reference run_test_instructblip_prompt.sh /
# run_test_llava_prompt.sh): --backend instructblip|llava, retrieval on/off.
set -e
DATADIR=${DATADIR:?set DATADIR}
OUTDIR=${OUTDIR:?set OUTDIR}
BACKEND=${BACKEND:-instructblip}
python -m vacnic_tpu.cli lmm \
  --backend "$BACKEND" \
  --data-dict "$DATADIR/GoodNews/test_dict_newsmep_ent_clip8sent_contras_name_pos.json" \
  --data-base-dir "$DATADIR/GoodNews/goodnews" \
  --dataset goodnews --use-retrieval \
  --out "$OUTDIR/${BACKEND}_goodnews_retrieveTrue_prompt.json" \
  "$@"
