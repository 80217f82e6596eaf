"""Convert a reference HF checkpoint snapshot into the native format.

Usage (on a host where the snapshot was staged):
    python scripts/convert_checkpoint.py --src /path/to/Labbeti_conette \
        --dst /path/to/native_ckpt

The source dir needs config.json + pytorch_model.bin (or model.safetensors).
The output dir loads with ``CoNeTTEModel.from_pretrained(dst)`` with zero
torch dependency at serve time, and prints per-component csums for the
round-2 parity audit (greedy token bit-match vs
results/detailed_outputs/outputs_clotho_eval.csv).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True, help="HF snapshot directory")
    parser.add_argument("--dst", required=True, help="output native checkpoint dir")
    args = parser.parse_args()

    from conette_tpu.huggingface.model import CoNeTTEModel
    from conette_tpu.utils.csum import csum_module

    model = CoNeTTEModel.from_pretrained(args.src)
    print(f"tokenizer vocab: {model.tokenizer.get_vocab_size()}")
    print(f"encoder csum:    {csum_module(model.encoder_params):016x}")
    print(f"model csum:      {csum_module(model.params):016x}")
    model.save_pretrained(args.dst)
    print(f"saved native checkpoint → {args.dst}")

    # quick self-check: reload and compare csums
    reloaded = CoNeTTEModel.from_pretrained(args.dst)
    assert csum_module(reloaded.params) == csum_module(model.params)
    assert csum_module(reloaded.encoder_params) == csum_module(model.encoder_params)
    print("reload csum check OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
