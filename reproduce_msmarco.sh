#!/usr/bin/env bash
# Reproduce the reference's published MS MARCO-dev numbers
# (/root/reference/README.md:35: MRR@10 0.38174..., Recall@1000 0.97885...)
# with the TPU-native pipeline, the day real data and weights are mountable.
#
# This environment has zero network egress and no local MS MARCO copy
# (BASELINE.md "Quality-parity status"), so this script asserts its inputs
# and exits with instructions when they are absent. Every command below is
# the production CLI path, already proven end-to-end on synthetic data by
# examples/pipeline_differential.py (PIPELINE_DIFF.json) and tests/.
#
# Required inputs (override via env):
#   DATA_DIR/collection.tsv        8.8M passages, "pid\ttext"
#                                  (msmarco-passage collection.tar.gz)
#   DATA_DIR/queries.dev.small.tsv 6980 dev queries, "qid\ttext"
#   DATA_DIR/qrels.dev.small.tsv   MSMARCO qrels (tab-separated)
#   CKPT                           trained CL-DRD checkpoint: either the
#                                  published torch checkpoint_*.pth.tar
#                                  (loaded via our hf_loader conversion) or
#                                  a .msgpack from cldrd_tpu training
#   TOKENIZER                      HF tokenizer name/path
#                                  (distilbert-base-uncased files)
set -euo pipefail

DATA_DIR="${DATA_DIR:-/data/msmarco}"
CKPT="${CKPT:-/data/cl-drd/checkpoint_250000.pth.tar}"
TOKENIZER="${TOKENIZER:-/data/tokenizers/distilbert-base-uncased}"
OUT="${OUT:-./msmarco_repro}"
TOPK="${TOPK:-1000}"

for f in "$DATA_DIR/collection.tsv" "$DATA_DIR/queries.dev.small.tsv" \
         "$DATA_DIR/qrels.dev.small.tsv"; do
  if [ ! -f "$f" ]; then
    echo "MISSING INPUT: $f"
    echo "Mount MS MARCO (collection + dev queries + qrels), the trained"
    echo "CL-DRD checkpoint, and the distilbert-base-uncased tokenizer,"
    echo "then re-run. See header comments for the expected layout."
    exit 2
  fi
done
[ -e "$CKPT" ] || { echo "MISSING CHECKPOINT: $CKPT"; exit 2; }

mkdir -p "$OUT"

# 1. Encode the 8.8M-passage collection and build the flat-IP index
#    (reference: retriever/index_text.py, ~2.5 h on an RTX 8000; TPU
#    target <15 min with the pre-tokenized cache warm).
python -m cldrd_tpu.cli.index \
  --collection "$DATA_DIR/collection.tsv" \
  --checkpoint "$CKPT" \
  --tokenizer "$TOKENIZER" \
  --out "$OUT/index" \
  --max-length 256 --batch-size 512 \
  --store-dtype float32 \
  --token-cache "$OUT/token_cache"

# 2. Top-1000 retrieval for the 6980 dev queries
#    (reference: retriever/retrieve_top_passages.py).
#    bf16 HBM + default MXU precision is the production configuration; add
#    --hbm-dtype float32 --precision highest for FAISS-fp32-parity scoring.
python -m cldrd_tpu.cli.retrieve \
  --index "$OUT/index" \
  --queries "$DATA_DIR/queries.dev.small.tsv" \
  --checkpoint "$CKPT" \
  --tokenizer "$TOKENIZER" \
  --run "$OUT/dev.run.tsv" \
  --max-length 30 --topk "$TOPK" \
  --encode-batch-size 512 --search-batch-size 512

# 3. Metrics (reference: evaluation/retrieval_evaluator.py CLI main).
#    Expected (reference README.md:35):
#      MRR@10   = 0.38174398508209395
#      Recall@1000 = 0.9788562559694365
python -m cldrd_tpu.cli.evaluate \
  --qrels "$DATA_DIR/qrels.dev.small.tsv" \
  --run "$OUT/dev.run.tsv" \
  --per-query "$OUT/dev.per_query.csv" | tee "$OUT/metrics.json"
