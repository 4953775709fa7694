#!/usr/bin/env bash
# Few-shot ICL evaluation, no training (reference scripts/run_icl.sh analog).
# Usage: run_icl.sh -d vqav2 -m idefics-9b -s 16
set -euo pipefail

DATASET="vqav2"
MODEL="idefics-9b"
SHOTS=16
QUERIES=500
while getopts "d:m:s:q:" opt; do
  case $opt in
    d) DATASET="$OPTARG" ;;
    m) MODEL="$OPTARG" ;;
    s) SHOTS="$OPTARG" ;;
    q) QUERIES="$OPTARG" ;;
    *) echo "usage: $0 [-d dataset] [-m model] [-s num_shots] [-q num_queries]"; exit 2 ;;
  esac
done

exec python -m mimic_tpu eval \
  model_name="$MODEL" data.name="$DATASET" data.num_shot="$SHOTS" \
  data.num_query_samples="$QUERIES"
