"""Encoder parity vs the reference's ACTUAL ConvNeXt code.

Rounds 1-2 proved the JAX encoder against a builder-written torch twin
(`tests/test_convnext.py`) — a shared misunderstanding there would pass
silently, the same gap VERDICT r2 flagged for decoding. This runs the
reference's real `nn/encoders/convnext.py` (ConvNeXtBlock/ConvNeXt:22-336
+ the `convnext_tiny` factory with the [252,56] audioset stem, :356-447)
via the torchoutil/torchlibrosa shims with randomized weights, converts
the torch state dict through the production converter
(`huggingface/convert.py::convert_convnext`), and asserts output parity
on both input paths:

* ``waveform_input=False`` — spectrogram in, exercising bn0 → stem →
  stages → freq-mean → frame/clip heads (pure reference-code compute);
* ``waveform_input=True`` — waveform in, additionally exercising our
  STFT/mel/log frontend against the torchlibrosa semantics the reference
  pipeline is built on (hann/center/reflect power STFT, slaney mel,
  power_to_db with ref=1, amin=1e-10, top_db=None — convnext.py:144-180).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conette_tpu.huggingface.convert import convert_convnext
from conette_tpu.models.convnext import convnext_apply

from reference_shim import load_reference_convnext

pytestmark = pytest.mark.slow  # full-depth ConvNeXt-Tiny forward on CPU


@pytest.fixture(scope="module")
def ref_and_params():
    cn = load_reference_convnext()
    torch.manual_seed(0)
    model = cn.convnext_tiny(
        pretrained=False,
        after_stem_dim=[252, 56],
        use_speed_perturb=False,
        waveform_input=False,
        use_specaug=False,
        return_frame_outputs=True,
        return_clip_outputs=True,
    ).eval()
    # perturb EVERY parameter + the bn0 running stats away from their
    # init-time fixed points (LN ones/zeros, scale_layer 1e-6, BN 0/1) so
    # a converter that dropped or swapped any tensor cannot pass
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=gen))
        model.bn0.running_mean.copy_(0.5 * torch.randn(224, generator=gen))
        model.bn0.running_var.copy_(1.0 + 0.3 * torch.rand(224, generator=gen))
    state = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    params = convert_convnext(state, prefix="")
    return cn, model, params


def test_spectrogram_path_matches_reference_code(ref_and_params):
    _, model, params = ref_and_params
    rng = np.random.default_rng(2)
    b, t, f = 2, 128, 224
    mel = (rng.standard_normal((b, t, f)) * 4.0 - 3.0).astype(np.float32)
    frame_lens = np.array([t, 100], np.int64)

    with torch.no_grad():
        ref = model(
            torch.from_numpy(mel[:, None]),  # (B, 1, T, F)
            torch.tensor([[1, t, f], [1, 100, f]]),
        )

    ours = convnext_apply(
        params,
        jnp.asarray(mel),
        jnp.asarray(frame_lens),
        waveform_input=False,
        deterministic=True,
        use_fused_block=False,
    )

    np.testing.assert_array_equal(
        np.asarray(ours["frame_embs_lens"]), ref["frame_embs_lens"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(ours["frame_embs"]),
        ref["frame_embs"].numpy(),
        atol=2e-4,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["clipwise_output"]),
        ref["clipwise_output"].numpy(),
        atol=1e-5,
    )


def test_waveform_path_matches_reference_code(ref_and_params):
    cn, spec_model, params = ref_and_params
    wave_model = cn.convnext_tiny(
        pretrained=False,
        after_stem_dim=[252, 56],
        use_speed_perturb=False,
        waveform_input=True,
        use_specaug=False,
        return_frame_outputs=True,
        return_clip_outputs=True,
    ).eval()
    wave_model.load_state_dict(spec_model.state_dict())

    rng = np.random.default_rng(3)
    b, n = 2, 32_000
    wave = (rng.standard_normal((b, n)) * 0.1).astype(np.float32)
    wave_lens = np.array([n, 24_000], np.int64)

    with torch.no_grad():
        ref = wave_model(
            torch.from_numpy(wave),
            torch.tensor([[n], [24_000]]),
        )

    ours = convnext_apply(
        params,
        jnp.asarray(wave),
        jnp.asarray(wave_lens),
        waveform_input=True,
        deterministic=True,
        use_fused_block=False,
    )

    np.testing.assert_array_equal(
        np.asarray(ours["frame_embs_lens"]), ref["frame_embs_lens"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(ours["frame_embs"]),
        ref["frame_embs"].numpy(),
        atol=5e-3,
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(ours["clipwise_output"]),
        ref["clipwise_output"].numpy(),
        atol=1e-4,
    )
