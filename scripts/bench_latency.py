"""Single-clip captioning latency (p50/p90), the BASELINE.json secondary
metric: one 10 s clip, beam=3, full waveform→caption-token pipeline.

Run: python scripts/bench_latency.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--wav-seconds", type=float, default=10.0)
    parser.add_argument("--vocab", type=int, default=4000)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from conette_tpu.models.conette import (
        ConetteConfig,
        conette_init,
        encode_audio,
        forward_generate,
    )
    from conette_tpu.models.convnext import convnext_apply, convnext_init

    n_wav = int(args.wav_seconds * 32_000)
    cfg = ConetteConfig(vocab_size=args.vocab)
    ke, km = jax.random.split(jax.random.PRNGKey(0))
    enc_params = convnext_init(ke)
    model_params = conette_init(km, cfg)
    forbid = jnp.zeros((args.vocab,), bool).at[100:].set(True)

    @jax.jit
    def pipeline(enc_params, model_params, waveform, jitter, lens, bos_ids):
        waveform = waveform + jitter * 1e-6
        outs = convnext_apply(enc_params, waveform, lens, compute_dtype=jnp.bfloat16)
        audio = jnp.swapaxes(outs["frame_embs"], 1, 2)
        memory, pad_mask = encode_audio(model_params, cfg, audio, outs["frame_embs_lens"])
        memory = memory.astype(jnp.bfloat16)
        res = forward_generate(
            model_params, cfg, memory, pad_mask, bos_ids, forbid_rep_mask=forbid
        )
        return res.best_preds

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((1, n_wav)).astype(np.float32) * 0.1)
    lens = jnp.asarray([n_wav], jnp.int32)
    bos = jnp.asarray([4], jnp.int32)

    _ = np.asarray(pipeline(enc_params, model_params, wav, jnp.float32(0), lens, bos))

    lat = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = np.asarray(
            pipeline(enc_params, model_params, wav, jnp.float32(i + 1), lens, bos)
        )
        lat.append(time.perf_counter() - t0)
    lat_ms = sorted(x * 1e3 for x in lat)
    p50 = lat_ms[len(lat_ms) // 2]
    p90 = lat_ms[int(len(lat_ms) * 0.9)]
    print(
        json.dumps(
            {
                "metric": "caption_latency_10s_clip_beam3",
                "p50_ms": round(p50, 2),
                "p90_ms": round(p90, 2),
                "unit": "ms",
                "note": "includes host dispatch+fetch round trips",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
