#!/usr/bin/env bash
# LIVE/LICV baseline training + eval + analyze (reference scripts/run_live.sh analog).
set -euo pipefail

RUNNAME="licv"
DATASET="vqav2"
MODEL="idefics-9b"
QUERIES=500
SHOTS=16
while getopts "r:d:m:q:s:" opt; do
  case $opt in
    r) RUNNAME="$OPTARG" ;;
    d) DATASET="$OPTARG" ;;
    m) MODEL="$OPTARG" ;;
    q) QUERIES="$OPTARG" ;;
    s) SHOTS="$OPTARG" ;;
    *) echo "usage: $0 [-r runname] [-d dataset] [-m model] [-q num_queries] [-s num_shots]"; exit 2 ;;
  esac
done

exec python -m mimic_tpu pipeline \
  -r "$RUNNAME" -m "$MODEL" -d "$DATASET" -q "$QUERIES" -s "$SHOTS" -p licv
