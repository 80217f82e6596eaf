"""conette-train — the full training pipeline.

Orchestration twin of the reference ``main_train``
(``src/conette/train.py:359-527``), reorganized for JAX/TPU and composed
from phase modules (mirroring the reference's train.py/callbacks split):

1/6 setup (``train/run_setup.py``): seed, run dir, RunLogger, optional
    ``jax_debug_nans`` (the reference's ``detect_anomaly`` + NaN
    early-stop twin);
2/6 tokenizers + train-time transforms (SpecAugmentRatio on embeddings);
3/6 datamodule (HDF) + model params + optimizer;
4/6 fit (``train/loop.py``): jitted train step (pjit-DP over the local
    mesh when >1 device), per-epoch validation (multi-ref forced loss +
    generated candidates → CIDEr-D/FENSE monitors,
    ``train/eval_run.py``), monitored checkpointing with ``best`` link;
5/6 test with the best checkpoint: beam-3 generation + AllMetrics corpus
    scoring + CSV/DCASE export (single-host scoring — the TPU analogue of
    the reference's rank-0 eval handoff, ``train.py:419-433``);
6/6 artifact dump (``train/artifacts.py``): resolved config, tokenizer,
    metrics, durations, csums.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Any, Optional

import numpy as np

from conette_tpu.train.run_setup import run_tag, setup_run  # noqa: F401  (re-export)

pylog = logging.getLogger(__name__)


def main_train(argv: Optional[list[str]] = None) -> dict[str, Any]:
    argv = list(sys.argv[1:] if argv is None else argv)

    from conette_tpu.config import load_config

    cfg = load_config("train", argv)

    # ------------------------------------------------------------ 1/6 setup
    import jax
    import jax.numpy as jnp

    from conette_tpu.parallel.distributed import is_main_process

    run_dir, logger, seed, t_start = setup_run(cfg, argv)

    # ----------------------------------------------- 2/6 tokenizer + tfms
    from conette_tpu.tokenization import AACTokenizer

    tok_cfg = dict(cfg.get("tok", {}))
    tokenizer = AACTokenizer(**tok_cfg)

    # -------------------------------------------------- 3/6 dm + model
    from conette_tpu.data.datamodule import HDFDataModule
    from conette_tpu.models.conette import (
        ConetteConfig,
        add_task_tokens,
        build_forbid_rep_mask,
        conette_init,
    )

    dm_cfg = cfg.get("dm", {})
    hdf_root = dm_cfg.get("hdf_root", "data/HDF")

    def resolve(paths: list[str]) -> list[str]:
        return [p if os.path.isabs(p) else os.path.join(hdf_root, p) for p in paths]

    dm = HDFDataModule(
        tokenizer,
        train_fpaths=resolve(dm_cfg.get("train_hdfs", [])),
        val_fpaths=resolve(dm_cfg.get("val_hdfs", [])),
        test_fpaths=resolve(dm_cfg.get("test_hdfs", [])),
        predict_fpaths=resolve(dm_cfg.get("predict_hdfs", [])),
        bsize=int(dm_cfg.get("bsize", 512)),
        main_hdf_pattern=dm_cfg.get("main_hdf_pattern"),
        balance_mode=dm_cfg.get("balance_mode", "none"),
        main_hdf_duplicate=dm_cfg.get("main_hdf_duplicate"),
        main_hdf_min=dm_cfg.get("main_hdf_min"),
        main_hdf_balanced=dm_cfg.get("main_hdf_balanced"),
        n_added_data=dm_cfg.get("n_added_data"),
        # the reference resamples added data only when Lightning rebuilds
        # the dataloader (trainer.reload_dataloaders_every_n_epochs; the
        # camw_* balancing recipes set 1, default 0 keeps the first draw)
        reload_every_n_epochs=int(
            cfg.get_path("trainer.reload_dataloaders_every_n_epochs", 0) or 0
        ),
        caption_quantum=int(dm_cfg.get("caption_quantum", 4)),
        caption_max_len=int(dm_cfg.get("caption_max_len", 64)),
        seed=seed,
        # multi-host: each process feeds its slice of the global batch
        # (DDP DistributedSampler twin; global bsize = bsize × processes)
        process_rank=jax.process_index(),
        process_count=jax.process_count(),
        fixed_shapes=bool(dm_cfg.get("fixed_shapes", False)),
    )
    dm.setup_fit()
    dm.setup_test()

    pl_cfg = cfg.get("pl", {})
    task_mode = pl_cfg.get("task_mode", "ds_src")
    task_names = tuple(pl_cfg.get("task_names", ("clotho",)))
    task_token_ids = add_task_tokens(tokenizer, task_names, task_mode)

    model_cfg = ConetteConfig(
        vocab_size=tokenizer.get_vocab_size(),
        task_mode=task_mode,
        task_names=task_names,
        label_smoothing=float(pl_cfg.get("label_smoothing", 0.2)),
        mixup_alpha=float(pl_cfg.get("mixup_alpha", 0.4)),
        min_pred_size=int(pl_cfg.get("min_pred_size", 3)),
        max_pred_size=int(pl_cfg.get("max_pred_size", 20)),
        beam_size=int(pl_cfg.get("beam_size", 3)),
        nhead=int(pl_cfg.get("nhead", 8)),
        d_model=int(pl_cfg.get("d_model", 256)),
        num_decoder_layers=int(pl_cfg.get("num_decoder_layers", 6)),
        decoder_dropout_p=float(pl_cfg.get("decoder_dropout_p", 0.2)),
        dim_feedforward=int(pl_cfg.get("dim_feedforward", 2048)),
        proj_dropout_p=float(pl_cfg.get("proj_dropout_p", 0.5)),
        bos_id=tokenizer.bos_token_id,
        eos_id=tokenizer.eos_token_id,
        pad_id=tokenizer.pad_token_id,
    )

    def task_token_fn(item: dict) -> int:
        if task_mode == "none":
            return model_cfg.bos_id
        name = item["dataset"]
        if task_mode == "ds_src" and item.get("source"):
            name = f"{item['dataset']}_{item['source']}".lower()
        return task_token_ids.get(name, model_cfg.bos_id)

    dm.task_token_fn = task_token_fn

    # train-time audio transform (production: SpecAugmentRatio on embs)
    tr_cfg = cfg.get("trainer", {})
    aug_name = dm_cfg.get("train_audio_transform", "none")
    spec_aug_fn = None
    # audio_t.train group (reference conf/audio_t/spec_aug[_ratio]_emb.yaml,
    # packaged by the root defaults / hp expt packs) takes precedence over
    # the legacy dm.train_audio_transform switch
    aug_cfg = dict(cfg.get("audio_t", {}).get("train") or {})
    target = str(aug_cfg.get("_target_", ""))
    if target.endswith("SpecAugmentRatio"):
        import functools

        from conette_tpu.train.augment import spec_augment_ratio

        spec_aug_fn = functools.partial(
            spec_augment_ratio,
            time_ratios=tuple(
                float(r) for r in aug_cfg.get("time_ratios", (0.0, 0.1))
            ),
            time_stripes_num=int(aug_cfg.get("time_stripes_num", 2)),
            freq_ratios=tuple(
                float(r) for r in aug_cfg.get("freq_ratios", (0.0, 0.1))
            ),
            freq_stripes_num=int(aug_cfg.get("freq_stripes_num", 2)),
        )
    elif target.endswith("SpecAugment"):
        import functools

        from conette_tpu.train.augment import spec_augment

        spec_aug_fn = functools.partial(
            spec_augment,
            time_drop_width=int(aug_cfg.get("time_max_width", 64)),
            time_stripes_num=int(aug_cfg.get("time_stripes_num", 2)),
            freq_drop_width=int(aug_cfg.get("freq_max_width", 28)),
            freq_stripes_num=int(aug_cfg.get("freq_stripes_num", 2)),
        )
    elif aug_name == "spec_augment_ratio":
        from conette_tpu.train.augment import spec_augment_ratio

        spec_aug_fn = spec_augment_ratio

    params = conette_init(jax.random.PRNGKey(seed), model_cfg)

    from conette_tpu.utils.csum import csum_module

    pylog.info(f"Model csum at start: {csum_module(params)}")
    logger.log_hyperparams({"start_csum": csum_module(params)})

    # resume (weight warm start; optimizer momentum restored further down
    # once the optax state skeleton exists)
    resumed_opt_flat = None
    loaded: dict[str, Any] = {}
    if cfg.get("resume"):
        from conette_tpu.train.checkpoint import load_checkpoint
        from conette_tpu.huggingface.convert import flatten_pytree, unflatten_pytree

        loaded = load_checkpoint(cfg["resume"], cfg.get("ign_weights"))
        flat = flatten_pytree(params)
        loaded_flat = flatten_pytree(loaded["params"])
        # strict_resume (reference train.py:175-177 passes strict to
        # load_state_dict, default true): checkpoint keys must exactly
        # cover the model unless ign_weights already filtered some out
        if bool(cfg.get("strict_resume", True)) and not cfg.get("ign_weights"):
            missing = sorted(set(flat) - set(loaded_flat))
            unexpected = sorted(set(loaded_flat) - set(flat))
            if missing or unexpected:
                raise ValueError(
                    f"strict resume mismatch: {len(missing)} missing "
                    f"(e.g. {missing[:3]}), {len(unexpected)} unexpected "
                    f"(e.g. {unexpected[:3]}); set strict_resume=false or "
                    "ign_weights to load a partial checkpoint"
                )
        # shape mismatches error regardless of strictness (torch's
        # load_state_dict reports size mismatches even with strict=False)
        bad_shapes = [
            k
            for k in loaded_flat
            if k in flat
            and tuple(np.shape(flat[k])) != tuple(np.shape(loaded_flat[k]))
        ]
        if bad_shapes:
            raise ValueError(
                f"resume shape mismatch for {bad_shapes[:5]} "
                f"(checkpoint vs model); use ign_weights to drop them"
            )
        flat.update({k: v for k, v in loaded_flat.items() if k in flat})
        params = unflatten_pytree(flat)
        if cfg.get("resume_opt_state", True) and not cfg.get("ign_weights"):
            resumed_opt_flat = loaded.get("opt_state_flat")
        pylog.info(f"Resumed weights from {cfg['resume']} (csum {csum_module(params)})")

    from conette_tpu.train.optim import get_optimizer
    from conette_tpu.train.step import TrainState, init_train_state

    max_epochs = int(tr_cfg.get("max_epochs", 400))
    base_lr = float(pl_cfg.get("lr", 5e-4))
    sched_name = pl_cfg.get("sched_name", "cos_decay")
    sched_kwargs = dict(pl_cfg.get("sched_kwargs", {}))
    tx, _ = get_optimizer(
        params,
        optim_name=pl_cfg.get("optim_name", "AdamW"),
        lr=base_lr,
        weight_decay=float(pl_cfg.get("weight_decay", 2.0)),
        betas=tuple(pl_cfg.get("betas", (0.9, 0.999))),
        eps=float(pl_cfg.get("eps", 1e-8)),
        use_custom_wd=bool(pl_cfg.get("use_custom_wd", True)),
        sched_name=sched_name,
        sched_n_steps=max_epochs,
        sched_kwargs=sched_kwargs,
    )
    # ------------------------------------------------------------ 4/6 fit
    import optax

    grad_clip = tr_cfg.get("grad_clip_norm")
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(float(grad_clip)), tx)
    # gradient accumulation (reference trainer.accumulate_grad_batches,
    # PL semantics): parameters update every k micro-batches on the
    # averaged gradients. optax.MultiSteps keeps the step count in terms
    # of optimizer updates, so schedules/momentum see k micro-batches as
    # one step, like Lightning.
    accum = int(tr_cfg.get("accumulate_grad_batches", 1) or 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    state = init_train_state(params, tx)
    if resumed_opt_flat is not None:
        from conette_tpu.train.checkpoint import restore_opt_state

        try:
            state = TrainState(
                state.params,
                restore_opt_state(resumed_opt_flat, state.opt_state),
                int(loaded["meta"].get("global_step", loaded["meta"].get("step", 0))),
            )
            pylog.info("Restored optimizer state (resume with momentum).")
        except ValueError as err:
            pylog.warning(f"Could not restore optimizer state: {err}")

    # optional EMA of weights (reference's optional EMA callback twin)
    ema_decay = tr_cfg.get("ema_decay")

    # optional SWA (reference's optional StochasticWeightAveraging callback,
    # train.py:167-280 assembly): average snapshots from swa_start onwards
    swa_start_cfg = tr_cfg.get("swa_start")
    swa_start = None
    if swa_start_cfg is not None:
        swa_start = (
            int(float(swa_start_cfg) * max_epochs)
            if isinstance(swa_start_cfg, float) or float(swa_start_cfg) < 1
            else int(swa_start_cfg)
        )

    # reduce-on-plateau: host-side factor injected into the optimizer lr
    from conette_tpu.train.optim import ReduceLROnPlateau, get_schedule

    plateau = None
    if str(sched_name).lower() in ("reduce_lr_on_plateau", "reducelronplateau"):
        plateau = ReduceLROnPlateau(
            mode=sched_kwargs.get("mode", "min"),
            factor=sched_kwargs.get("factor", 0.1),
            patience=sched_kwargs.get("patience", 10),
        )
        lr_schedule = lambda step: base_lr * plateau.factor  # noqa: E731
    else:
        # per-epoch LR logging (LogLRCallback twin, callbacks/log.py:16-60)
        lr_schedule = get_schedule(sched_name, base_lr, max_epochs, **sched_kwargs)

    from conette_tpu.train.objective import training_loss

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(p):
            return training_loss(
                p, model_cfg, batch, rng,
                use_mixup=model_cfg.mixup_alpha > 0,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, opt_state, state.step + 1),
            {"train/loss": loss, "train/grad_norm": optax.global_norm(grads)},
        )

    # Data-parallel over the device mesh when >1 device (the reference's DDP
    # twin: XLA inserts the gradient all-reduce over the `data` axis).
    # Multi-host: the mesh spans ALL processes' devices; each host feeds its
    # local rows and the global batch is assembled per-process
    # (global bsize = local bsize × process_count, like per-rank DDP loaders).
    dp_cfg = tr_cfg.get("data_parallel", "auto")
    n_proc = jax.process_count()
    n_dev = jax.local_device_count() if n_proc == 1 else jax.device_count()
    use_mesh = (
        (dp_cfg == "auto" and n_dev > 1)
        or (isinstance(dp_cfg, int) and dp_cfg > 1)
        or n_proc > 1
    )
    if use_mesh and dm.bsize % max(jax.local_device_count(), 1) != 0:
        pylog.warning(
            f"batch size {dm.bsize} not divisible by {n_dev} devices; "
            "running single-device"
        )
        use_mesh = False
    if use_mesh:
        from conette_tpu.parallel.mesh import make_mesh, replicated, batch_sharding

        n_dp = n_dev if (dp_cfg == "auto" or n_proc > 1) else int(dp_cfg)
        # no `with mesh:` — all shardings below are explicit NamedShardings
        # that carry the mesh themselves, so no ambient context is needed
        # (and nothing leaks at function exit)
        mesh = make_mesh(
            n_dp,
            model_parallel=int(tr_cfg.get("model_parallel", 1)),
            devices=jax.devices() if n_proc > 1 else None,
        )
        repl = replicated(mesh)
        state = jax.device_put(state, repl)
        bsh = batch_sharding(mesh)

        if n_proc > 1:

            def shard_train_batch(b: dict) -> dict:
                return {
                    k: jax.make_array_from_process_local_data(bsh, np.asarray(v))
                    for k, v in b.items()
                }

        else:

            def shard_train_batch(b: dict) -> dict:
                return {k: jax.device_put(v, bsh) for k, v in b.items()}

        pylog.info(
            f"Training data-parallel over {n_dp} devices"
            + (f" across {n_proc} hosts" if n_proc > 1 else "")
        )
    else:
        shard_train_batch = lambda b: b  # noqa: E731

    train_step = jax.jit(train_step, donate_argnums=(0,))

    from conette_tpu.metrics.functional import fense as fense_mod
    from conette_tpu.train.checkpoint import CheckpointManager
    from conette_tpu.train.eval_run import EvalRunner

    ck_cfg = cfg.get("ckpts", {})
    monitor = ck_cfg.get("monitor", "val/fense")
    if "fense" in monitor and not fense_mod.is_available():
        monitor = ck_cfg.get("fallback_monitor", "val/cider_d")
        pylog.info(f"FENSE unavailable; monitoring {monitor} instead")
    ckpt = CheckpointManager(
        os.path.join(run_dir, "checkpoints"),
        monitor=monitor,
        mode=ck_cfg.get("mode", "max"),
        top_k=int(ck_cfg.get("top_k", 1)),
        save_after_epoch=int(ck_cfg.get("save_after_epoch", 0)),
    )

    forbid_np = build_forbid_rep_mask(tokenizer, "content_words")
    eval_runner = EvalRunner(
        dm=dm,
        tokenizer=tokenizer,
        model_cfg=model_cfg,
        run_dir=run_dir,
        logger=logger,
        forbid=jnp.asarray(forbid_np),
        gen_val=pl_cfg.get("gen_val_cands", "generate"),
        gen_test=pl_cfg.get("gen_test_cands", "generate"),
        lim_val=tr_cfg.get("limit_val_batches"),
        lim_test=tr_cfg.get("limit_test_batches"),
        monitor=monitor,
    )

    lim_train = tr_cfg.get("limit_train_batches")
    log_every_n_steps = max(int(tr_cfg.get("log_every_n_steps", 50)), 1)
    rng = jax.random.PRNGKey(seed)

    aug_rng = jax.random.fold_in(rng, 7)
    aug_jit = jax.jit(spec_aug_fn) if spec_aug_fn is not None else None

    # spec-aug stripes are keyed per GLOBAL row (fold_in of the row id, not
    # a batch-size-dependent split) so each process draws exactly the
    # stripes its rows would get in the single-process run — what makes the
    # 2-process full-fit equality test hold with augmentation ON
    aug_row_ids = jnp.asarray(
        jax.process_index() * dm.bsize + np.arange(dm.bsize), jnp.int32
    )

    def to_train_batch(b: dict, step: int) -> dict:
        batch = {
            "audio": jnp.asarray(b["audio"]),
            "audio_lens": jnp.asarray(b["audio_lens"]),
            "captions": jnp.asarray(b["captions"]),
        }
        if aug_jit is not None:
            # time_valid: stripes sized/placed within each row's REAL
            # length, so the augmentation is invariant to pad width
            # (batch-max vs dataset-max fixed shapes)
            batch["audio"] = aug_jit(
                jax.random.fold_in(aug_rng, step), batch["audio"],
                row_ids=aug_row_ids, time_valid=batch["audio_lens"],
            )
        return batch

    # val_on_start (reference train.py:457-482: validate before fit, e.g.
    # after a warm-start resume)
    if cfg.get("val_on_start") and dm.num_eval_loaders("val") > 0:
        start_metrics = eval_runner.run_validation(state.params, -1)
        logger.log_metrics({f"start_{k}": v for k, v in start_metrics.items()})
        pylog.info(f"val_on_start: {start_metrics}")

    # test_on_start (reference train.py:477-482): when warm-starting from
    # a checkpoint, score the starting weights first (evaluator "start")
    if (
        cfg.get("test_on_start")
        and cfg.get("resume")
        and dm.num_eval_loaders("test") > 0
        and is_main_process()
    ):
        eval_runner.run_test("start", state.params)

    # opt-in device tracing (reference conf/trainer/profiler group twin):
    # trainer=... trainer.profiler.name=jax writes a TensorBoard-loadable
    # trace of the fit loop into the run dir
    profiler_cfg = dict(tr_cfg.get("profiler") or {})
    profiler_on = profiler_cfg.get("name") == "jax"
    if profiler_on and is_main_process():
        trace_dir = profiler_cfg.get("trace_dir") or os.path.join(run_dir, "profile")
        jax.profiler.start_trace(trace_dir)
        pylog.info(f"jax.profiler trace → {trace_dir}")

    from conette_tpu.train.loop import fit

    fit_res = fit(
        state=state,
        rng=rng,
        dm=dm,
        train_step=train_step,
        shard_train_batch=shard_train_batch,
        to_train_batch=to_train_batch,
        eval_runner=eval_runner,
        ckpt=ckpt,
        logger=logger,
        tokenizer=tokenizer,
        model_cfg=model_cfg,
        lr_schedule=lr_schedule,
        plateau=plateau,
        base_lr=base_lr,
        max_epochs=max_epochs,
        # trainer.max_steps (reference fit_test.yaml:28, PL semantics: -1 =
        # unlimited; otherwise stop fitting after that many optimizer steps)
        max_steps=int(tr_cfg.get("max_steps", -1) or -1),
        lim_train=lim_train,
        val_every_n_epochs=int(tr_cfg.get("val_every_n_epochs", 1)),
        log_every_n_steps=log_every_n_steps,
        ema_decay=ema_decay,
        swa_start=swa_start,
        debug=bool(cfg.get("debug")),
    )
    state, swa_params = fit_res.state, fit_res.swa_params
    if profiler_on and is_main_process():
        jax.profiler.stop_trace()
    logger.log_metrics({"fit_duration_s": fit_res.fit_duration})

    # ------------------------------------------------------------ 5/6 test
    test_scores: dict[str, Any] = {}
    test_by_model: dict[str, dict[str, Any]] = {}
    # Host-0-only corpus scoring — the TPU answer to the reference's
    # "destroy the DDP group and re-test on a fresh rank-0 single-device
    # trainer" handoff (train.py:419-433,489-496): SPICE/FENSE-style metric
    # subprocesses are not distributed-safe, so only host 0 decodes+scores.
    # testing.run ∈ {"none","last","swa","best"}* — the reference runs a
    # test (+predict) pass per entry, naming the evaluator after the
    # weights under test (train.py:297-356; conf/train.yaml:78-81
    # defaults to [best])
    testing_run = cfg.get("testing", {}).get("run", ["best"])
    if isinstance(testing_run, str):
        testing_run = [testing_run]
    testing_run = [str(m) for m in testing_run]
    if (
        cfg.get("test_after_fit", True)
        and (
            dm.num_eval_loaders("test") > 0
            or dm.num_eval_loaders("predict") > 0
        )
        and is_main_process()
        and testing_run != ["none"]
    ):
        # candidate weights per mode, processed in the reference's order
        # (last → swa → best) so `best` wins the primary `test` result
        candidates: list[tuple[str, Any]] = []
        for mode in ("last", "swa", "best"):
            if mode not in testing_run:
                continue
            if mode == "last":
                candidates.append(("last", state.params))
            elif mode == "swa":
                if swa_params is None:
                    pylog.warning(
                        "testing.run includes 'swa' but no SWA snapshots "
                        "were taken (trainer.swa_start unset or past "
                        "max_epochs); skipping"
                    )
                else:
                    candidates.append(("swa", swa_params))
            else:  # best
                if ckpt.best_dir is not None:
                    from conette_tpu.train.checkpoint import load_checkpoint

                    pylog.info(f"Testing with best checkpoint {ckpt.best_dir}")
                    # "val/fense" -> "best_fense": the reference names the
                    # evaluator after the monitor (train.py:332-338), which
                    # prefixes the published CSVs' per-sentence columns
                    candidates.append(
                        (
                            f"best_{monitor.rsplit('/', 1)[-1]}",
                            load_checkpoint(ckpt.best_dir)["params"],
                        )
                    )
                elif "last" not in testing_run:
                    # reference train.py:346-353: fall back to last weights
                    pylog.warning(
                        "Cannot find best checkpoint; testing with last "
                        "weights."
                    )
                    candidates.append(("last", state.params))
                else:
                    pylog.error("Cannot find best checkpoint.")

        for model_name, params_i in candidates:
            test_by_model[model_name] = eval_runner.run_test(model_name, params_i)
        if test_by_model:
            test_scores = next(reversed(test_by_model.values()))
    elif dm.num_eval_loaders("predict") > 0 and is_main_process():
        pylog.warning(
            "dm.predict_hdfs is set but testing is disabled "
            f"(test_after_fit={cfg.get('test_after_fit', True)}, "
            f"testing.run={testing_run}); no predictions exported"
        )

    # ------------------------------------------------------- 6/6 artifacts
    if not is_main_process():
        return {
            "run_dir": run_dir,
            "best": None,
            "test": {},
            "test_by_model": {},
            "out": float(cfg.get("out_default", -1.0)),
        }
    from conette_tpu.train.artifacts import finalize_run

    out = finalize_run(
        cfg=cfg,
        run_dir=run_dir,
        logger=logger,
        tokenizer=tokenizer,
        params=state.params,
        ckpt=ckpt,
        monitor=monitor,
        t_start=t_start,
    )
    return {
        "run_dir": run_dir,
        "best": ckpt.best_score,
        "test": test_scores,
        "test_by_model": test_by_model,
        "out": out,
    }


if __name__ == "__main__":
    from conette_tpu.utils.misc import hard_exit

    main_train()
    hard_exit(0)
