#!/usr/bin/env bash
# Precise-evaluation launcher (reference scripts/test.sh): runs the tester with
# the dumped config and a chosen checkpoint from the experiment folder.
set -e

PYTHON=python
DATASET=scannet
EXP_NAME=debug
WEIGHT=model_best

while getopts "p:d:n:w:" opt; do
  case $opt in
    p) PYTHON=$OPTARG ;;
    d) DATASET=$OPTARG ;;
    n) EXP_NAME=$OPTARG ;;
    w) WEIGHT=$OPTARG ;;
    \?) echo "Invalid option: -$OPTARG"; exit 1 ;;
  esac
done

EXP_DIR=exp/${DATASET}/${EXP_NAME}
CODE_DIR=${EXP_DIR}/code
export PYTHONPATH=./${CODE_DIR}:$PYTHONPATH

$PYTHON "$CODE_DIR"/tools/test.py \
  --config-file "${EXP_DIR}/config.py" \
  --options save_path="$EXP_DIR" weight="${EXP_DIR}/model/${WEIGHT}.pth"
