#!/usr/bin/env python
"""Training-step throughput on the real chip.

The reference trains CoNeTTE in ~3-4 h on one V100 (README.md:46-59) over
pre-encoded HDF embeddings; the trainable model is projection + 6-layer
decoder. This measures the jitted train step (mixup + teacher forcing +
label-smoothed CE + AdamW) at the production shapes:

    python scripts/bench_train.py [--batch 512] [--iters 20]

Prints one JSON line: steps/s, samples/s, and the projected epoch time for
the balanced CL+AC+MA+WC recipe (~70k clips/epoch with main_hdf_min).

``measure_train()`` is also imported by the repo-root ``bench.py`` so the
driver's per-round bench artifact carries the train-side number too
(VERDICT r4 next #7) — train-perf regressions get tracked per round like
inference ones.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_train(
    batch: int = 512,
    iters: int = 20,
    frames: int = 31,
    cap_len: int = 22,
    vocab: int = 4000,
) -> dict:
    """Time the jitted flagship train step; returns the report dict."""
    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
    except Exception:
        pass

    from conette_tpu.models.conette import ConetteConfig, conette_init
    from conette_tpu.train.objective import training_loss
    from conette_tpu.train.optim import get_optimizer
    from conette_tpu.train.step import TrainState, init_train_state

    cfg = ConetteConfig(vocab_size=vocab)
    params = conette_init(jax.random.PRNGKey(0), cfg)
    tx, _ = get_optimizer(params, sched_n_steps=100)
    state = init_train_state(params, tx)

    rng_np = np.random.default_rng(0)
    host_batch = {
        "audio": rng_np.standard_normal((batch, frames, 768)).astype(np.float32),
        "audio_lens": np.full((batch,), frames, np.int32),
        "captions": rng_np.integers(4, vocab, size=(batch, cap_len)).astype(np.int32),
    }
    dev_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}

    @jax.jit
    def train_step(state: TrainState, b, rng):
        def loss_fn(p):
            return training_loss(p, cfg, b, rng, use_mixup=True)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, opt_state, state.step + 1), loss

    rng = jax.random.PRNGKey(1)
    state, loss = train_step(state, dev_batch, rng)
    _ = float(loss)  # compile + run

    t0 = time.perf_counter()
    losses = []
    for i in range(iters):
        state, loss = train_step(state, dev_batch, jax.random.fold_in(rng, i))
        losses.append(loss)
    last = float(losses[-1])  # fetch forces the chain
    dt = time.perf_counter() - t0

    steps_s = iters / dt
    samples_s = steps_s * batch
    # reference main_hdf_min epoch (hdf.py:249-269): len(clotho_dev) main
    # clips + the SAME count sampled from the pooled AC+MA+WC others
    epoch_clips = 2 * 3_839
    return {
        "metric": "train_step_throughput",
        "steps_per_s": round(steps_s, 2),
        "samples_per_s": round(samples_s, 1),
        "batch": batch,
        "loss": round(last, 4),
        "projected_epoch_s": round(epoch_clips / samples_s, 1),
        "projected_100_epochs_h": round(100 * epoch_clips / samples_s / 3600, 2),
    }


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--frames", type=int, default=31, help="frame embs per clip (10 s)")
    parser.add_argument("--cap-len", type=int, default=22)
    parser.add_argument("--vocab", type=int, default=4000)
    args = parser.parse_args()

    print(
        json.dumps(
            measure_train(
                batch=args.batch,
                iters=args.iters,
                frames=args.frames,
                cap_len=args.cap_len,
                vocab=args.vocab,
            )
        )
    )
    return 0


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    os._exit(rc)  # PJRT teardown can hang over the tunnel
