#!/usr/bin/env bash
# Stage the gated metric resources on a CONNECTED host (the reference's
# conette-prepare downloads these — prepare.py:567-576). TPU hosts are
# egress-less: run this elsewhere and copy ~/.cache/conette_tpu/ across.
set -euo pipefail

CACHE="${CONETTE_METRICS_CACHE:-$HOME/.cache/conette_tpu/aac-metrics}"
mkdir -p "$CACHE"

echo "Downloading Java metric jars to $CACHE ..."
# Stanford PTB tokenizer (coco-caption)
curl -L -o "$CACHE/stanford-corenlp-3.4.1.jar" \
  "https://repo1.maven.org/maven2/edu/stanford/nlp/stanford-corenlp/3.4.1/stanford-corenlp-3.4.1.jar"
# METEOR 1.5 (from the aac-metrics mirror of coco-caption)
curl -L -o "$CACHE/meteor-1.5.jar" \
  "https://github.com/tylin/coco-caption/raw/master/pycocoevalcap/meteor/meteor-1.5.jar"
# SPICE 1.0
curl -L -o "$CACHE/spice-1.0.jar" \
  "https://panderson.me/images/SPICE-1.0.zip" && echo "unzip SPICE-1.0.zip manually → spice-1.0.jar"

echo "Optionally pre-cache the FENSE SBERT model:"
echo "  python -c \"from sentence_transformers import SentenceTransformer as S; S('paraphrase-TinyBERT-L6-v2')\""
echo
echo "And the reference checkpoints for conversion (CONETTE_CKPT_DIR):"
echo "  huggingface-cli download Labbeti/conette --local-dir <dir>"
echo "  curl -L -o convnext_tiny_471mAP_BL_AC_75kit.pth 'https://zenodo.org/record/8020843/files/convnext_tiny_471mAP_BL_AC_75kit.pth?download=1'"
