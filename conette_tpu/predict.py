"""conette-predict — caption audio files from the command line.

CLI parity with the reference (``src/conette/predict.py:27-236``): same
flags (``--audio`` list, ``--task``, ``--model_name``, ``--model_path``,
``--device``, ``--token``, ``--seed``, ``--csv_export``, ``--verbose``) and
the same CSV export columns (audio, task, candidate).
"""

from __future__ import annotations

import argparse
import csv
import logging
import sys
from typing import Optional

from conette_tpu import DEFAULT_MODEL_NAME, get_sample_path

pylog = logging.getLogger(__name__)


def get_predict_args(argv: Optional[list[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Generate audio captions with a pretrained CoNeTTE model (TPU/JAX build)."
    )
    parser.add_argument(
        "--audio", type=str, nargs="+", default=[get_sample_path()],
        help="Audio file paths to caption.",
    )
    parser.add_argument(
        "--task", type=str, nargs="+", default=None,
        help="Task token(s); defaults to the model's default_task "
        "(reference predict.py:40-46 passes None through).",
    )
    parser.add_argument("--model_name", type=str, default=DEFAULT_MODEL_NAME)
    parser.add_argument("--model_path", type=str, default=None, help="Local model/run directory.")
    parser.add_argument("--device", type=str, default="auto", help="Accepted for parity; JAX places arrays.")
    parser.add_argument("--token", type=str, default=None)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--csv_export", type=str, default=None)
    parser.add_argument("--beam_size", type=int, default=None)
    parser.add_argument(
        "--dtype",
        type=str,
        default="float32",
        choices=("float32", "bfloat16"),
        help="Encoder compute dtype. float32 matches the reference "
        "numerics exactly (XLA path); bfloat16 enables the fused TPU "
        "block kernel for peak throughput.",
    )
    parser.add_argument("--verbose", type=int, default=1)
    return parser.parse_args(argv)


def main_predict(argv: Optional[list[str]] = None) -> int:
    args = get_predict_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose >= 2 else logging.INFO,
        format="%(message)s",
        stream=sys.stdout,
    )

    from conette_tpu.huggingface.model import CoNeTTEModel

    import jax.numpy as jnp

    path = args.model_path if args.model_path is not None else args.model_name
    model = CoNeTTEModel.from_pretrained(
        path,
        token=args.token,
        verbose=args.verbose,
        seed=args.seed,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )

    tasks = args.task
    if tasks is None:
        tasks = [model.default_task] * len(args.audio)
    if len(tasks) == 1:
        tasks = tasks * len(args.audio)
    if len(tasks) != len(args.audio):
        raise ValueError(
            f"--task count ({len(tasks)}) must be 1 or match --audio count ({len(args.audio)})"
        )

    outputs = model(args.audio, task=tasks, beam_size=args.beam_size)
    cands = outputs["cands"]

    rows = []
    for fpath, task, cand in zip(args.audio, tasks, cands):
        if args.verbose >= 1:
            print(f'File "{fpath}" with task "{task}": "{cand}"')
        rows.append({"audio": fpath, "task": task, "candidate": cand})

    if args.csv_export is not None:
        with open(args.csv_export, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["audio", "task", "candidate"])
            writer.writeheader()
            writer.writerows(rows)
        if args.verbose >= 1:
            print(f"Exported {len(rows)} captions to {args.csv_export}")
    return 0


if __name__ == "__main__":
    from conette_tpu.utils.misc import hard_exit

    hard_exit(main_predict())
