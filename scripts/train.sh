#!/usr/bin/env bash
# Experiment-folder training launcher (reference scripts/train.sh):
# creates exp/${DATASET}/${NAME} with model/ and code/ (a code snapshot that is
# what actually runs), dumps the config, supports resume (-r true).
set -e

PYTHON=python
DATASET=scannet
CONFIG=None
EXP_NAME=debug
WEIGHT=None
RESUME=false

while getopts "p:d:c:n:w:r:" opt; do
  case $opt in
    p) PYTHON=$OPTARG ;;
    d) DATASET=$OPTARG ;;
    c) CONFIG=$OPTARG ;;
    n) EXP_NAME=$OPTARG ;;
    w) WEIGHT=$OPTARG ;;
    r) RESUME=$OPTARG ;;
    \?) echo "Invalid option: -$OPTARG"; exit 1 ;;
  esac
done

EXP_DIR=exp/${DATASET}/${EXP_NAME}
MODEL_DIR=${EXP_DIR}/model
CODE_DIR=${EXP_DIR}/code
CONFIG_DIR=configs/${DATASET}/${CONFIG}.py

echo "Experiment dir: $EXP_DIR"
if [ "${RESUME}" = true ] && [ -d "${EXP_DIR}" ]; then
  CONFIG_DIR=${EXP_DIR}/config.py
  WEIGHT=${MODEL_DIR}/model_last.pth
else
  mkdir -p "$MODEL_DIR" "$CODE_DIR"
  echo "Snapshotting code to ${CODE_DIR}"
  cp -r ponderv2_tpu tools "$CODE_DIR"
fi

export PYTHONPATH=./${CODE_DIR}:$PYTHONPATH
echo "Running with config $CONFIG_DIR"

if [ "${WEIGHT}" = "None" ]; then
  $PYTHON "$CODE_DIR"/tools/train.py \
    --config-file "$CONFIG_DIR" \
    --options save_path="$EXP_DIR"
else
  $PYTHON "$CODE_DIR"/tools/train.py \
    --config-file "$CONFIG_DIR" \
    --options save_path="$EXP_DIR" resume="$RESUME" weight="$WEIGHT"
fi
