"""Training step tests: loss semantics vs torch CE, mixup invariants, and
the pjit-sharded multi-chip step on the virtual 8-device CPU mesh."""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conette_tpu.models.conette import ConetteConfig, conette_init
from conette_tpu.train.objective import (
    label_smoothed_ce,
    per_caption_ce,
    randperm_diff,
    sample_lambda,
    training_loss,
    validation_loss,
)
from conette_tpu.train.optim import cos_decay_schedule, decay_mask, get_optimizer
from conette_tpu.train.step import init_train_state, make_train_step

pytestmark = pytest.mark.slow  # heavy compiles / e2e; deselect with -m 'not slow'

CFG = ConetteConfig(
    vocab_size=32, d_model=32, nhead=2, num_decoder_layers=2,
    dim_feedforward=64, max_pred_size=8,
)


def _batch(b=4, t=6, L=8, seed=0):
    rng = np.random.default_rng(seed)
    caps = rng.integers(4, 32, size=(b, L)).astype(np.int32)
    caps[:, -2:] = 0  # pad tail
    caps[:, 0] = 5  # "task token"
    return {
        "audio": jnp.asarray(rng.standard_normal((b, t, 768)).astype(np.float32)),
        "audio_lens": jnp.asarray(np.full((b,), t, np.int32)),
        "captions": jnp.asarray(caps),
    }


class TestLoss:
    @pytest.mark.parametrize("smoothing", [0.0, 0.2])
    def test_label_smoothed_ce_matches_torch(self, smoothing):
        rng = np.random.default_rng(0)
        B, L, V = 3, 7, 11
        logits = rng.standard_normal((B, V, L)).astype(np.float32)
        targets = rng.integers(0, V, size=(B, L)).astype(np.int64)
        targets[0, 5:] = 0
        ours = float(
            label_smoothed_ce(jnp.asarray(logits), jnp.asarray(targets), 0, smoothing)
        )
        ref = torch.nn.CrossEntropyLoss(ignore_index=0, label_smoothing=smoothing)(
            torch.from_numpy(logits), torch.from_numpy(targets)
        )
        np.testing.assert_allclose(ours, float(ref), rtol=1e-5)

    def test_per_caption_ce_matches_torch(self):
        rng = np.random.default_rng(1)
        B, L, V = 4, 6, 9
        logits = rng.standard_normal((B, V, L)).astype(np.float32)
        targets = rng.integers(1, V, size=(B, L)).astype(np.int64)
        targets[2, 3:] = 0
        ours = np.asarray(per_caption_ce(jnp.asarray(logits), jnp.asarray(targets), 0))
        ce = torch.nn.CrossEntropyLoss(ignore_index=0, reduction="none")(
            torch.from_numpy(logits), torch.from_numpy(targets)
        ).numpy()
        mask = targets != 0
        ref = (ce * mask).sum(1) / mask.sum(1)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


class TestMixup:
    def test_lambda_in_upper_half(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 64)
        lbds = np.array([float(sample_lambda(k, 0.4)) for k in keys])
        assert (lbds >= 0.5).all() and (lbds <= 1.0).all()
        assert lbds.std() > 0.01

    def test_randperm_diff_no_fixed_points(self):
        for seed in range(5):
            perm = np.asarray(randperm_diff(jax.random.PRNGKey(seed), 8))
            assert sorted(perm.tolist()) == list(range(8))
            assert (perm != np.arange(8)).all()


class TestTrainStep:
    def test_loss_decreases_on_fixed_batch(self):
        params = conette_init(jax.random.PRNGKey(0), CFG)
        tx, _ = get_optimizer(params, lr=1e-3, weight_decay=0.01, sched_n_steps=100)
        state = init_train_state(params, tx)
        step = make_train_step(CFG, tx, use_mixup=False, donate=False)
        batch = _batch()
        rng = jax.random.PRNGKey(0)
        first = None
        for i in range(8):
            state, metrics = step(state, batch, rng)
            if first is None:
                first = float(metrics["train/loss"])
        last = float(metrics["train/loss"])
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first

    def test_gradients_flow_to_all_params(self):
        params = conette_init(jax.random.PRNGKey(0), CFG)
        batch = _batch()
        grads = jax.grad(
            lambda p: training_loss(p, CFG, batch, jax.random.PRNGKey(1))
        )(params)
        leaves = jax.tree.leaves(jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads))
        # all but a couple of leaves (pad embedding row is still reachable) nonzero
        nonzero = sum(1 for v in leaves if v > 0)
        assert nonzero >= len(leaves) - 1

    def test_validation_loss_finite(self):
        params = conette_init(jax.random.PRNGKey(0), CFG)
        rng = np.random.default_rng(2)
        mult = rng.integers(3, 32, size=(2, 5, 8)).astype(np.int32)
        mult[0, 3:] = 0  # empty refs for example 0
        batch = {
            "audio": jnp.asarray(rng.standard_normal((2, 6, 768)).astype(np.float32)),
            "audio_lens": jnp.asarray([6, 4], jnp.int32),
            "mult_captions": jnp.asarray(mult),
        }
        loss = float(validation_loss(params, CFG, batch))
        assert np.isfinite(loss)

    def test_per_ref_losses_ignores_task_stamped_pad_rows(self):
        """A ref row that exists only as batch padding gets the task token
        stamped into column 0 by the batch post-processor — it must not
        count as a valid caption (it would contribute a spurious 0.0 to
        val/loss and the test CSV losses column)."""
        from conette_tpu.train.objective import per_ref_losses

        params = conette_init(jax.random.PRNGKey(0), CFG)
        rng = np.random.default_rng(3)
        mult = rng.integers(3, 32, size=(2, 3, 8)).astype(np.int32)
        # example 1 has only 1 real ref; rows 1-2 are pad except the
        # stamped task token in column 0
        mult[1, 1:, :] = 0
        mult[:, :, 0] = 5  # task token stamped into EVERY row
        batch = {
            "audio": jnp.asarray(
                rng.standard_normal((2, 6, 768)).astype(np.float32)
            ),
            "audio_lens": jnp.asarray([6, 6], jnp.int32),
            "mult_captions": jnp.asarray(mult),
        }
        _, valid = per_ref_losses(params, CFG, batch)
        valid = np.asarray(valid)
        assert valid[0].all()
        assert valid[1, 0] and not valid[1, 1] and not valid[1, 2]


class TestOptim:
    def test_decay_mask_excludes_1d(self):
        params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,)), "scale": jnp.ones((4,))}
        mask = decay_mask(params)
        assert mask["w"] and not mask["b"] and not mask["scale"]

    def test_cos_decay_endpoints(self):
        sched = cos_decay_schedule(1.0, 100)
        assert float(sched(jnp.asarray(0))) == pytest.approx(1.0)
        assert float(sched(jnp.asarray(50))) == pytest.approx(0.5)
        # CosDecayRule clamps the step at n-1, so the tail floors at the
        # last-step value (reference optim/schedulers.py:109-112)
        last = 0.5 * (1.0 + math.cos(math.pi * 99 / 100))
        assert float(sched(jnp.asarray(100))) == pytest.approx(last, abs=1e-7)
        assert float(sched(jnp.asarray(500))) == pytest.approx(last, abs=1e-7)


class TestMultichip:
    def test_dryrun_8_devices(self):
        assert len(jax.devices()) == 8
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_dryrun_uneven(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(2)

    def test_dp_matches_single_device(self):
        """Sharded step must produce the same loss as the unsharded step."""
        from conette_tpu.parallel.mesh import make_mesh, shard_batch
        from conette_tpu.train.step import make_sharded_train_step

        params = conette_init(jax.random.PRNGKey(0), CFG)
        tx, _ = get_optimizer(params, lr=1e-3, weight_decay=0.01, sched_n_steps=10)
        state = init_train_state(params, tx)
        batch = _batch(b=8)
        rng = jax.random.PRNGKey(3)

        single = make_train_step(CFG, tx, use_mixup=False, donate=False)
        _, m1 = single(state, batch, rng)

        mesh = make_mesh(4, model_parallel=1)
        with mesh:
            state2 = init_train_state(params, tx)
            state2, fn = make_sharded_train_step(
                CFG, tx, mesh, state2, batch, use_mixup=False
            )
            sbatch = shard_batch(batch, mesh)
            _, m2 = fn(state2, sbatch, rng)
        np.testing.assert_allclose(
            float(m1["train/loss"]), float(m2["train/loss"]), rtol=1e-5
        )


class TestGradAccumulation:
    def test_multisteps_updates_every_k(self):
        """accumulate_grad_batches semantics (optax.MultiSteps): params
        move only every k micro-batches, and the k-step update equals one
        step on the averaged gradients."""
        import optax

        k = 2
        inner = optax.sgd(0.1)
        tx = optax.MultiSteps(inner, every_k_schedule=k)
        params = conette_init(jax.random.PRNGKey(0), CFG)
        step = make_train_step(CFG, tx, use_mixup=False, donate=False)
        state = init_train_state(params, tx)
        rng = jax.random.PRNGKey(1)
        b1, b2 = _batch(seed=1), _batch(seed=2)

        state1, _ = step(state, b1, rng)
        # after micro-batch 1 of 2: params unchanged
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state1.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        state2, _ = step(state1, b2, rng)
        # after micro-batch 2: params moved by sgd on the grad AVERAGE
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(params), jax.tree.leaves(state2.params)
            )
        )
        assert moved

        from conette_tpu.train.objective import training_loss

        g1 = jax.grad(lambda p: training_loss(p, CFG, b1, jax.random.fold_in(rng, 0), use_mixup=False))(params)
        g2 = jax.grad(lambda p: training_loss(p, CFG, b2, jax.random.fold_in(rng, 1), use_mixup=False))(params)
        avg = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)
        expect = jax.tree.map(lambda p, g: p - 0.1 * g, params, avg)
        for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(state2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
