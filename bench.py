"""Benchmark: end-to-end captioning throughput (clips/sec) at beam=3.

Measures the flagship inference path on the available accelerator and
compares against a PyTorch-CPU reference-style pipeline (torch ConvNeXt twin
+ torch TransformerDecoder + Python beam loop re-running the full prefix each
step without a KV cache, as the reference does — nn/decoding/beam.py:113-127).

Two measured variants (VERDICT r4 next #2 made the realistic one the
headline):

- ``realistic44k`` (HEADLINE): 44.1 kHz input clips (Clotho's native rate,
  transforms/get.py:650-660) resampled →32 kHz INSIDE the measured window by
  the device polyphase resampler (the flagship path's resample stage,
  huggingface/preprocessor.py:134-141 in the reference), and SCRIPTED
  caption lengths matching the released checkpoint's distribution
  (mean ≈11.6 tokens incl. EOS on Clotho-eval, max 18 — measured from
  results/detailed_outputs/outputs_clotho_eval.csv): each clip gets a
  target length sampled from that distribution and a per-clip EOS bias
  schedule forces its beams to retire there, so the beam while_loop runs
  exactly as many steps as the longest caption in the batch (≈18), the
  all-finished early exit fires as it would under real weights, and the
  printed mean length is checkable. (A single global EOS bias cannot do
  this: measured on both stacks, a constant bias has a cliff — beams
  either retire at min_pred+1 or never — because random-weight logits
  have no per-step length signal.)
- ``maxlen32k`` (legacy, kept for round-to-round continuity with
  BENCH_r01..r04): 32 kHz input, random weights, every beam runs the full
  20 steps.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/s", "vs_baseline": N, ...}

The CPU baselines are cached in .bench_cpu_baseline.json (they are a
property of the host, not of our code under test). The train-step
throughput (scripts/bench_train.py) is embedded as ``train_*`` keys so
train-side perf regressions are driver-visible per round (VERDICT #7).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

# 384 measured best in the within-session sweep (BATCH_SWEEP r3: 128:696,
# 256:710, 384:720, 512:707 clips/s) -- amortizes the ~30 ms serialized
# relay dispatch tax without hitting the 512 regression
BATCH = 384
CLIP_SECONDS = 10
SR = 32_000
SR_IN = 44_100  # Clotho's native rate; the realistic variant feeds this
VOCAB = 4000
BEAM = 3
MAX_PRED = 20
MIN_PRED = 3
CACHE_FILE = os.path.join(os.path.dirname(__file__), ".bench_cpu_baseline.json")

# Released-checkpoint caption-length distribution (incl. EOS) on Clotho-eval
# (results/detailed_outputs/outputs_clotho_eval.csv: mean ≈11.6, max 18).
# The realistic variants sample per-clip target lengths from a clipped
# normal with these stats and force EOS there via beam_search's
# eos_bias_schedule; the bench prints the MEASURED mean/max length so the
# realism claim is checkable per round, not assumed.
LEN_MEAN, LEN_STD, LEN_MIN, LEN_MAX = 11.6, 2.6, 5, 18
EOS_FORCE = 1.0e4  # dominates any random-weight logit; NEG min-len mask still wins


def target_lengths(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.clip(
        np.round(rng.normal(LEN_MEAN, LEN_STD, n)), LEN_MIN, LEN_MAX
    ).astype(np.int32)


def eos_schedule(lengths: np.ndarray, max_pred: int = MAX_PRED) -> np.ndarray:
    # force EOS at step >= L-1 so the caption is exactly L tokens incl. EOS
    steps = np.arange(max_pred)[None, :]
    return np.where(steps >= lengths[:, None] - 1, EOS_FORCE, 0.0).astype(
        np.float32
    )

# Analytic FLOPs per 10 s clip (batch-independent): ConvNeXt-Tiny encoder
# ~40 GFLOP (stem + 4 stages pw/dw convs) + DFT-as-matmul frontend ~4.2 GFLOP
# + beam-3 decode (20 steps x 6 layers + classifier) ~1.0 GFLOP.
FLOPS_PER_CLIP = 45.2e9
# realistic variant adds the 44.1→32 kHz polyphase conv (320k out samples ×
# 5.3k taps × 2) ≈ +3.4 GFLOP; the beam while_loop exits at the batch's max
# scripted length (≈18/20 steps, -0.1 → rounded into the same total).
FLOPS_PER_CLIP_REALISTIC = 48.2e9
V5E_PEAK_FLOPS = 197e12  # bf16 peak of one v5e chip


def bench_tpu(
    batch: int = BATCH,
    iters: int = 5,
    repeats: int = 4,
    variant: str = "maxlen32k",
) -> tuple[float, float]:
    """Returns (best clips/s over ``repeats`` rounds, measured mean caption
    length incl. EOS)."""
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: repeated bench/driver runs skip the
    # (tens of seconds) XLA compile
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(__file__), ".jax_cache"),
        )
    except Exception:
        pass

    from conette_tpu.models.conette import (
        ConetteConfig,
        conette_init,
        encode_audio,
        forward_generate,
    )
    from conette_tpu.models.convnext import convnext_apply, convnext_init
    from conette_tpu.ops.resample import resample

    realistic = variant == "realistic44k"
    eos_real = realistic or variant == "eosreal32k"
    sr_in = SR_IN if realistic else SR

    cfg = ConetteConfig(vocab_size=VOCAB, beam_size=BEAM, min_pred_size=MIN_PRED,
                        max_pred_size=MAX_PRED)
    key = jax.random.PRNGKey(0)
    ke, km = jax.random.split(key)
    enc_params = convnext_init(ke)
    model_params = conette_init(km, cfg)
    sched = (
        jnp.asarray(eos_schedule(target_lengths(batch))) if eos_real else None
    )
    forbid = jnp.zeros((VOCAB,), bool).at[100:].set(True)

    @jax.jit
    def pipeline(enc_params, model_params, waveform, jitter, lens, bos_ids):
        # per-iteration on-device jitter forces a distinct computation each
        # dispatch (remote relays may memoize identical calls) without
        # re-uploading inputs
        waveform = waveform + jitter * 1e-6
        if realistic:
            # the flagship path's resample stage, inside the measured
            # window: device polyphase FIR (f32, golden-tested vs the
            # recorded torchaudio fixtures protocol)
            waveform = resample(waveform, SR_IN, SR)
            lens = jnp.round(lens * (SR / SR_IN)).astype(jnp.int32)
        outs = convnext_apply(enc_params, waveform, lens, compute_dtype=jnp.bfloat16)
        audio = jnp.swapaxes(outs["frame_embs"], 1, 2)
        memory, pad_mask = encode_audio(model_params, cfg, audio, outs["frame_embs_lens"])
        memory = memory.astype(jnp.bfloat16)  # bf16 KV cache / decode memory
        res = forward_generate(
            model_params, cfg, memory, pad_mask, bos_ids,
            forbid_rep_mask=forbid, eos_bias_schedule=sched,
        )
        return res.best_preds, res.best_avg_lprobs

    rng = np.random.default_rng(0)
    waveform = jnp.asarray(
        rng.standard_normal((batch, CLIP_SECONDS * sr_in)).astype(np.float32) * 0.1
    )
    lens = jnp.full((batch,), CLIP_SECONDS * sr_in, jnp.int32)
    bos_ids = jnp.full((batch,), 4, jnp.int32)

    # warmup/compile — fetch to host to force completion (block_until_ready
    # is unreliable over tunneled PJRT backends)
    warm_preds = np.asarray(
        pipeline(enc_params, model_params, waveform, jnp.float32(0), lens, bos_ids)[0]
    )
    # length = first-EOS position + 1; random weights can emit token 0
    # (= pad_id) as a content token, so counting non-pad would undercount.
    # Rows with no EOS (maxlen32k variant) ran the full MAX_PRED steps.
    has_eos = (warm_preds == cfg.eos_id).any(axis=1)
    got_lens = np.where(
        has_eos, np.argmax(warm_preds == cfg.eos_id, axis=1) + 1, MAX_PRED
    )
    mean_len = float(got_lens.mean())
    print(
        f"[{variant}] mean caption length (incl. EOS): {mean_len:.1f} "
        f"(target ≈{LEN_MEAN} for realistic variants; max across batch "
        f"{int(got_lens.max())})",
        file=sys.stderr,
    )
    if sched is not None:
        want = target_lengths(batch)
        if not (np.asarray(got_lens) == want).all():
            print(
                f"[{variant}] WARNING: scripted lengths not honored "
                f"({int((np.asarray(got_lens) != want).sum())}/{batch} clips "
                "differ) — the realism claim does not hold for this run",
                file=sys.stderr,
            )

    # Best-of-``repeats`` rounds (the timeit/min convention): the tunneled
    # chip is time-sliced between tenants (PROFILE.md "chip reality"), so a
    # single window measures tenancy luck as much as the program. The best
    # round is the closest observable to the program's unshared throughput;
    # per-round numbers go to stderr for the record.
    best = 0.0
    for r in range(repeats):
        t0 = time.perf_counter()
        outs = [
            pipeline(
                enc_params, model_params, waveform,
                jnp.float32(r * iters + i + 1), lens, bos_ids,
            )
            for i in range(iters)
        ]
        for preds, lprobs in outs:
            np.asarray(preds)  # force completion + host fetch of the token ids
        dt = time.perf_counter() - t0
        cps = batch * iters / dt
        print(f"bench[{variant}] round {r + 1}/{repeats}: {cps:.1f} clips/s",
              file=sys.stderr)
        best = max(best, cps)
    return best, mean_len


def bench_cpu_torch(variant: str = "maxlen32k") -> float:
    """Reference-style PyTorch-CPU pipeline (no KV cache, Python beam loop).
    The ``realistic44k`` variant resamples 44.1→32 kHz with the same
    polyphase filter bank (torchaudio-default math) as a strided conv1d and
    carries the same EOS bias, so both stacks measure the same task."""
    import torch
    import torch.nn as tnn

    from conette_tpu.ops.mel import mel_filterbank
    from conette_tpu.ops.resample import resample_kernel

    realistic = variant == "realistic44k"

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)

    class Block(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            self.dw = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
            self.norm = tnn.LayerNorm(dim, eps=1e-6)
            self.pw1 = tnn.Linear(dim, 4 * dim)
            self.pw2 = tnn.Linear(4 * dim, dim)
            self.scale = tnn.Parameter(torch.full((dim,), 1e-6))

        def forward(self, x):
            y = self.dw(x).permute(0, 2, 3, 1)
            y = self.pw2(torch.nn.functional.gelu(self.pw1(self.norm(y))))
            y = (self.scale * y).permute(0, 3, 1, 2)
            return x + y

    class Encoder(tnn.Module):
        def __init__(self):
            super().__init__()
            dims = (96, 192, 384, 768)
            depths = (3, 3, 9, 3)
            self.bn0 = tnn.BatchNorm2d(224)
            self.stem = tnn.Conv2d(1, 96, (4, 4), (4, 4), padding=(4, 0))
            self.stem_norm = tnn.LayerNorm(96, eps=1e-6)
            self.downs = tnn.ModuleList(
                tnn.Conv2d(dims[i], dims[i + 1], 2, 2) for i in range(3)
            )
            self.down_norms = tnn.ModuleList(tnn.LayerNorm(dims[i], eps=1e-6) for i in range(3))
            self.stages = tnn.ModuleList(
                tnn.Sequential(*[Block(dims[i]) for _ in range(depths[i])])
                for i in range(4)
            )
            fb = mel_filterbank(SR, 1024, 224, 50.0, 14000.0)
            self.register_buffer("melW", torch.from_numpy(fb))
            self.register_buffer("window", torch.hann_window(1024, periodic=True))

        def forward(self, wav):  # (B, T)
            spec = torch.stft(
                wav, 1024, 320, window=self.window, center=True,
                pad_mode="reflect", return_complex=True,
            )
            power = (spec.abs() ** 2).transpose(1, 2)  # (B, T, F)
            mel = torch.clamp(power @ self.melW, min=1e-10)
            x = (10.0 * torch.log10(mel))[:, None]  # (B,1,T,224)
            x = self.bn0(x.transpose(1, 3)).transpose(1, 3)
            x = self.stem(x)
            x = self.stem_norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            for i in range(4):
                if i > 0:
                    x = self.down_norms[i - 1](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                    x = self.downs[i - 1](x)
                x = self.stages[i](x)
            return x.mean(dim=3)  # (B, 768, T')

    layer = tnn.TransformerDecoderLayer(
        256, 8, 2048, dropout=0.0, activation=torch.nn.functional.gelu,
        batch_first=False, norm_first=False,
    )
    decoder = tnn.TransformerDecoder(layer, 6)
    emb = tnn.Embedding(VOCAB, 256, padding_idx=0)
    classifier = tnn.Linear(256, VOCAB)
    proj = tnn.Linear(768, 256)
    encoder = Encoder()
    for m in (encoder, decoder, emb, classifier, proj):
        m.eval()

    if realistic:
        kern_np, _width = resample_kernel(SR_IN, SR)
        kern = torch.from_numpy(kern_np)[:, None, :]  # (new, 1, K)
        orig = SR_IN // math.gcd(SR_IN, SR)
        width = _width
        target = int(math.ceil((SR / math.gcd(SR_IN, SR)) * CLIP_SECONDS * SR_IN
                               / orig))

        def do_resample(wav: torch.Tensor) -> torch.Tensor:
            x = torch.nn.functional.pad(wav[:, None, :], (width, width + orig))
            y = torch.nn.functional.conv1d(x, kern, stride=orig)
            y = y.transpose(1, 2).reshape(wav.shape[0], -1)
            return y[:, :target]

    @torch.no_grad()
    def caption(wav: torch.Tensor) -> list[int]:
        if realistic:
            wav = do_resample(wav)
        frames = encoder(wav)  # (1, 768, T')
        memory = proj(frames.transpose(1, 2)).transpose(0, 1)  # (T', 1, 256)
        memory = memory.repeat(1, BEAM, 1)
        beams = [([4], 0.0)] * BEAM
        finished = []
        for i in range(MAX_PRED):
            ids = torch.as_tensor([p for p, _ in beams]).T  # (i+1, beam)
            x = emb(ids) * math.sqrt(256)
            pos = torch.arange(ids.shape[0])[:, None]
            den = torch.exp(-torch.arange(0, 256, 2) * math.log(10000) / 256)
            pe = torch.zeros(ids.shape[0], 256)
            pe[:, 0::2] = torch.sin(pos * den)
            pe[:, 1::2] = torch.cos(pos * den)
            x = x + pe[:, None, :]
            sq = torch.triu(torch.full((ids.shape[0],) * 2, float("-inf")), 1)
            out = decoder(tgt=x, memory=memory[:, : x.shape[1]], tgt_mask=sq)
            logits = classifier(out[-1])  # (beam, vocab)
            if i < MIN_PRED:
                logits[:, 2] = -math.inf
            elif realistic and i >= round(LEN_MEAN) - 1:
                # scripted caption length (mean of the released-checkpoint
                # distribution) — same forcing the TPU side's
                # eos_bias_schedule applies, so both stacks run a
                # realistic number of Python/while_loop decode steps
                logits[:, 2] += EOS_FORCE
            lp = torch.log_softmax(logits, dim=-1)
            if i == 0:
                cand = lp[0:1]
                sums = torch.zeros(1)
            else:
                cand = lp
                sums = torch.as_tensor([s for _, s in beams])
            total = (sums[:, None] + cand).reshape(-1)
            k = len(beams)
            top = torch.topk(total, k)
            new_beams = []
            for score, idx in zip(top.values.tolist(), top.indices.tolist()):
                parent, tok = divmod(idx, VOCAB)
                seq = beams[parent][0] + [tok]
                if tok == 2 or i == MAX_PRED - 1:
                    finished.append((seq, score / (i + 1)))
                else:
                    new_beams.append((seq, score))
            beams = new_beams
            if not beams:
                break
        return max(finished, key=lambda x: x[1])[0]

    sr_in = SR_IN if realistic else SR
    rng = np.random.default_rng(0)
    wav = torch.from_numpy(
        rng.standard_normal((1, CLIP_SECONDS * sr_in)).astype(np.float32) * 0.1
    )
    first = caption(wav)  # warmup
    print(
        f"cpu baseline[{variant}] warmup caption length: {len(first) - 1}",
        file=sys.stderr,
    )
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        caption(wav)
    dt = time.perf_counter() - t0
    return n / dt


def _cpu_baseline(variant: str) -> float:
    """Per-variant cached torch-CPU baseline (a property of the host). The
    realistic baseline is re-measured if the length-scripting scheme
    changed (it changes how many steps the Python beam loop runs)."""
    key = {"maxlen32k": "clips_per_sec", "realistic44k": "realistic_clips_per_sec"}[
        variant
    ]
    cache: dict = {}
    if os.path.isfile(CACHE_FILE):
        with open(CACHE_FILE) as f:
            cache = json.load(f)
    len_mode = f"scripted{round(LEN_MEAN)}"
    stale = (
        variant == "realistic44k"
        and cache.get("realistic_len_mode") != len_mode
    )
    if key not in cache or stale:
        cache[key] = bench_cpu_torch(variant)
        if variant == "realistic44k":
            cache["realistic_len_mode"] = len_mode
        with open(CACHE_FILE, "w") as f:
            json.dump(cache, f)
    return cache[key]


def _probe_device(
    # r4: the observed stall windows run tens of minutes (PROFILE.md "chip
    # reality"); the default envelope now waits ~25 min before giving up so
    # an unattended (driver) run rides out a typical stall instead of
    # recording rc=1 moments before the tunnel returns
    attempts: int = int(os.environ.get("CONETTE_BENCH_PROBE_ATTEMPTS", 15)),
    timeout_s: int = int(os.environ.get("CONETTE_BENCH_PROBE_TIMEOUT", 60)),
    backoff_s: int = int(os.environ.get("CONETTE_BENCH_PROBE_BACKOFF", 45)),
) -> bool:
    """The tunneled chip intermittently stalls WHOLE dispatches (observed:
    even an 8x8 sum never returns, for minutes at a stretch). A hung PJRT
    call cannot be cancelled in-process, so probe in a SUBPROCESS that can
    be abandoned, and retry with backoff before committing this process to
    the real bench. Returns False if the device never answers."""
    import subprocess

    code = (
        "import numpy as np, jax, jax.numpy as jnp;"
        "print(float(np.asarray(jnp.sum(jnp.ones((8, 8))))))"
    )
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout_s,
                capture_output=True,
            )
            if r.returncode == 0 and b"64.0" in r.stdout:
                return True
            stderr = r.stderr.decode(errors="replace")
            # the tunnel also fails TRANSIENTLY with fast backend errors
            # (observed: FAILED_PRECONDITION on a plain 8x8 fetch while the
            # relay recovers) — retry those like a stall; only a genuinely
            # broken install (import errors, bad flags) aborts immediately.
            # anchored patterns ("UNAVAILABLE:" not bare "UNAVAILABLE"):
            # bare substrings appear in many PERSISTENT absl/gRPC failure
            # strings, which would retry through the full ~25 min envelope
            # instead of failing fast
            transient = any(
                pat in stderr
                for pat in (
                    "TPU backend error",
                    "FAILED_PRECONDITION:",
                    "DEADLINE_EXCEEDED:",
                    "UNAVAILABLE:",
                    "INTERNAL:",
                )
            )
            print(
                f"device probe exited rc={r.returncode}"
                + (" (transient backend error; retrying)" if transient else "")
                + f":\n{stderr[-2000:]}",
                file=sys.stderr,
            )
            if not transient:
                return False
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < attempts:
            print(
                f"device probe stalled (attempt {i + 1}/{attempts}); "
                f"retrying in {backoff_s}s",
                file=sys.stderr,
            )
            time.sleep(backoff_s)
        else:
            print(
                f"device probe stalled (attempt {i + 1}/{attempts})",
                file=sys.stderr,
            )
    return False


def _hard_exit(rc: int) -> None:
    """PJRT client teardown can hang forever over the tunnel; the JSON line
    is already printed, so skip interpreter shutdown entirely."""
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)


def _measure_train() -> dict | None:
    """Train-step throughput as part of the round artifact (VERDICT #7);
    never allowed to sink the bench."""
    if os.environ.get("CONETTE_BENCH_SKIP_TRAIN"):
        return None
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))
        from bench_train import measure_train

        return measure_train(iters=10)
    except Exception as e:  # noqa: BLE001
        print(f"train bench failed (non-fatal): {e!r}", file=sys.stderr)
        return None


def main() -> int:
    cpu_cps = _cpu_baseline("realistic44k")

    fused_seams = True
    fallback_reason = None
    try:
        tpu_cps, mean_len = bench_tpu(variant="realistic44k")
        legacy_cps, _ = bench_tpu(variant="maxlen32k", repeats=2)
    except Exception as e:  # noqa: BLE001 — never lose the bench artifact
        # A freshly-landed Pallas kernel can fail Mosaic compile on the real
        # chip before any tunnel window existed to validate it (interpret
        # mode does not enforce tiling/alignment). Fall back to the XLA seam
        # path rather than returning rc=1 for the round.
        print(
            f"bench pipeline failed ({type(e).__name__}); retrying with "
            "fused seams disabled:\n" + str(e)[-2000:],
            file=sys.stderr,
        )
        import conette_tpu.models.convnext as _cv

        _cv._FUSED_SEAMS = False
        fused_seams = False
        fallback_reason = f"{type(e).__name__}: {str(e)[:300]}"
        tpu_cps, mean_len = bench_tpu(variant="realistic44k")
        legacy_cps, _ = bench_tpu(variant="maxlen32k", repeats=2)

    train = _measure_train()

    # the fallback downgrade is recorded in the artifact so a round that
    # measured the XLA seam path is distinguishable from a fused-seams one
    payload = {
        "metric": "captioning_throughput_beam3_10s_clips_44k_eosreal",
        "value": round(tpu_cps, 3),
        "unit": "clips/s",
        "vs_baseline": round(tpu_cps / cpu_cps, 2),
        "mfu": round(tpu_cps * FLOPS_PER_CLIP_REALISTIC / V5E_PEAK_FLOPS, 4),
        "mean_caption_len": round(mean_len, 1),
        # legacy metric (32 kHz input, max-length decode) for continuity
        # with BENCH_r01..r04's "captioning_throughput_beam3_10s_clips"
        "legacy_maxlen32k_clips_per_s": round(legacy_cps, 3),
        "legacy_vs_baseline": round(legacy_cps / _cpu_baseline("maxlen32k"), 2),
        "legacy_mfu": round(legacy_cps * FLOPS_PER_CLIP / V5E_PEAK_FLOPS, 4),
        "fused_seams": fused_seams,
    }
    if train is not None:
        payload["train_samples_per_s"] = train["samples_per_s"]
        payload["train_projected_epoch_s"] = train["projected_epoch_s"]
    if fallback_reason is not None:
        payload["fallback"] = fallback_reason
    print(json.dumps(payload))
    return 0


def profile() -> int:
    """--profile: per-stage split (frontend / encoder / decode) + device
    trace under .bench_profile/ (see PROFILE.md for the full analysis)."""
    import jax
    import jax.numpy as jnp

    from conette_tpu.models.conette import (
        ConetteConfig, conette_init, encode_audio, forward_generate,
    )
    from conette_tpu.models.convnext import convnext_apply, convnext_init
    from conette_tpu.ops.frontend import LogMelConfig, logmel_spectrogram

    cfg = ConetteConfig(vocab_size=VOCAB, beam_size=BEAM,
                        min_pred_size=MIN_PRED, max_pred_size=MAX_PRED)
    ke, km = jax.random.split(jax.random.PRNGKey(0))
    enc_params = convnext_init(ke)
    model_params = conette_init(km, cfg)
    forbid = jnp.zeros((VOCAB,), bool).at[100:].set(True)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(
        rng.standard_normal((BATCH, CLIP_SECONDS * SR)).astype(np.float32) * 0.1
    )
    lens = jnp.full((BATCH,), CLIP_SECONDS * SR, jnp.int32)
    bos = jnp.full((BATCH,), 4, jnp.int32)

    @jax.jit
    def mel_only(w, j):
        return jnp.sum(
            logmel_spectrogram(w + j * 1e-6, LogMelConfig(),
                               compute_dtype=jnp.bfloat16).astype(jnp.float32)
        )

    @jax.jit
    def enc_only(w, l, j):
        outs = convnext_apply(enc_params, w + j * 1e-6, l, compute_dtype=jnp.bfloat16)
        return jnp.sum(outs["frame_embs"].astype(jnp.float32))

    @jax.jit
    def full(w, l, b, j):
        outs = convnext_apply(enc_params, w + j * 1e-6, l, compute_dtype=jnp.bfloat16)
        audio = jnp.swapaxes(outs["frame_embs"], 1, 2)
        memory, mask = encode_audio(model_params, cfg, audio, outs["frame_embs_lens"])
        memory = memory.astype(jnp.bfloat16)
        res = forward_generate(model_params, cfg, memory, mask, b,
                               forbid_rep_mask=forbid)
        return res.best_preds

    def t_of(fn, *args, iters=6):
        _ = np.asarray(fn(*args, jnp.float32(0)))
        t0 = time.perf_counter()
        outs = [fn(*args, jnp.float32(i + 1)) for i in range(iters)]
        for o in outs:
            np.asarray(o)
        return (time.perf_counter() - t0) / iters

    t_mel = t_of(mel_only, wav)
    t_enc = t_of(enc_only, wav, lens)
    t_full = t_of(full, wav, lens, bos)
    # variant cross-section (throughput at identical methodology, one window)
    real_cps, real_len = bench_tpu(variant="realistic44k", iters=3, repeats=2)
    eos32_cps, eos32_len = bench_tpu(variant="eosreal32k", iters=3, repeats=2)
    report = {
        "batch": BATCH,
        "mel_ms": round(t_mel * 1000, 1),
        "encoder_ms": round(t_enc * 1000, 1),
        "full_ms": round(t_full * 1000, 1),
        "decode_ms": round((t_full - t_enc) * 1000, 1),
        "clips_per_s": round(BATCH / t_full, 1),
        "mfu": round(BATCH / t_full * FLOPS_PER_CLIP / V5E_PEAK_FLOPS, 4),
        "variant_realistic44k_clips_per_s": round(real_cps, 1),
        "variant_realistic44k_mean_len": round(real_len, 1),
        "variant_eosreal32k_clips_per_s": round(eos32_cps, 1),
        "variant_eosreal32k_mean_len": round(eos32_len, 1),
    }
    trace_dir = os.path.join(os.path.dirname(__file__), ".bench_profile")
    os.makedirs(trace_dir, exist_ok=True)
    import jax.profiler

    with jax.profiler.trace(trace_dir):
        o = full(wav, lens, bos, jnp.float32(99))
        np.asarray(o)
    report["trace_dir"] = trace_dir
    print(json.dumps(report))
    return 0


def sweep() -> int:
    """--sweep: bench several batch sizes back-to-back in ONE process (the
    ~30 ms serialized relay tax amortizes with batch; within-session
    comparison — the time-sliced chip makes cross-run deltas meaningless)."""
    out = {}
    for batch in (128, 256, 384, 512):
        try:
            out[batch] = round(bench_tpu(batch, iters=3, repeats=2)[0], 1)
        except Exception as err:  # OOM etc.
            out[batch] = f"failed: {err}"
        print(json.dumps({"batch_sweep": out}))
    return 0


if __name__ == "__main__":
    if not _probe_device():
        print("bench aborted: TPU tunnel not answering", file=sys.stderr)
        _hard_exit(1)
    if "--profile" in sys.argv:
        _hard_exit(profile())
    if "--sweep" in sys.argv:
        _hard_exit(sweep())
    _hard_exit(main())
