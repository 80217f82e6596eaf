#!/usr/bin/env bash
# Stage the Java metric resources (PTB tokenizer, METEOR, SPICE) that the
# reference fetches via `aac-metrics` (reference prepare.py:567-576) into
# the cache this package reads (~/.cache/conette_tpu/aac-metrics, or
# override per-jar with CONETTE_PTB_JAR / CONETTE_METEOR_JAR /
# CONETTE_SPICE_JAR). Run on a CONNECTED host, then rsync the cache dir to
# the egress-less TPU host.
#
# SPIDEr = (CIDEr-D + SPICE)/2 becomes computable once spice-1.0.jar is
# staged; val/fense monitoring additionally needs the FENSE SBERT models
# (huggingface.co) which `pip install aac-metrics && aac-metrics-download`
# also fetches.
set -euo pipefail

CACHE="${1:-$HOME/.cache/conette_tpu/aac-metrics}"
mkdir -p "$CACHE"
cd "$CACHE"

fetch() {  # url dest
  [ -f "$2" ] && { echo "have $2"; return; }
  echo "fetching $2"
  curl -fL --retry 3 -o "$2" "$1"
}

# Stanford PTB tokenizer (test/metric tokenization; tokenizers/ptb.py)
fetch "https://github.com/tylin/coco-caption/raw/master/pycocoevalcap/tokenizer/stanford-corenlp-3.4.1.jar" \
      stanford-corenlp-3.4.1.jar

# METEOR 1.5 + paraphrase table (metrics/classes/all_metrics.py)
fetch "https://github.com/tylin/coco-caption/raw/master/pycocoevalcap/meteor/meteor-1.5.jar" \
      meteor-1.5.jar
mkdir -p data
fetch "https://github.com/tylin/coco-caption/raw/master/pycocoevalcap/meteor/data/paraphrase-en.gz" \
      data/paraphrase-en.gz

# SPICE (the CIDEr-D partner inside SPIDEr)
if [ ! -f spice-1.0.jar ]; then
  fetch "https://panderson.me/images/SPICE-1.0.zip" SPICE-1.0.zip
  unzip -o SPICE-1.0.zip 'SPICE-1.0/*' -d .
  cp SPICE-1.0/spice-1.0.jar .
  mkdir -p lib && cp -r SPICE-1.0/lib/* lib/ 2>/dev/null || true
  rm -rf SPICE-1.0 SPICE-1.0.zip
fi

echo "staged under $CACHE:"
ls -la "$CACHE"
