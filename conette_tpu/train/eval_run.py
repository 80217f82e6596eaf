"""Validation / test / predict machinery for ``conette-train``.

Twin of the reference's ``AACValidator`` wiring plus ``test_after_fit``
(``src/conette/train.py:283-356``; ``callbacks/aac_validator.py``,
``callbacks/aac_evaluator.py``): per-epoch multi-ref forced loss +
generated candidates → CIDEr-D/FENSE monitors, and beam-generation test
passes with ``AllMetrics`` corpus scoring + CSV/DCASE export. Extracted
from ``train/main.py`` (VERDICT r3 weak #7) with no behavior change.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import numpy as np

pylog = logging.getLogger(__name__)


def make_gen_fn(model_cfg, method: str = "generate"):
    import jax
    import jax.numpy as jnp

    from conette_tpu.models.conette import (
        encode_audio,
        forward_generate,
        forward_greedy,
    )

    @jax.jit
    def gen(params, audio, lens, bos, forbid):
        """→ (best_preds, best_avg_lprobs, all_beams, all_avg_lprobs) —
        the full decode surface the reference logs per clip (the published
        CSVs' preds/lprobs/mpreds/mlprobs columns); greedy is a 1-beam
        view of the same contract."""
        memory, pad_mask = encode_audio(params, model_cfg, audio, lens)
        if method == "greedy":
            g = forward_greedy(
                params, model_cfg, memory, pad_mask, bos, forbid_rep_mask=forbid
            )
            lp = jax.nn.log_softmax(jnp.transpose(g.logits, (0, 2, 1)), axis=-1)
            sel = jnp.take_along_axis(lp, g.preds[..., None], axis=-1)[..., 0]
            valid = g.preds != model_cfg.pad_id
            avg = jnp.sum(jnp.where(valid, sel, 0.0), axis=1) / jnp.maximum(
                valid.sum(axis=1), 1
            )
            return g.preds, avg, g.preds[:, None], avg[:, None]
        res = forward_generate(
            params, model_cfg, memory, pad_mask, bos, forbid_rep_mask=forbid
        )
        return (
            res.best_preds,
            res.best_avg_lprobs,
            res.global_preds,
            res.global_avg_lprobs,
        )

    return gen


def decode_preds(tokenizer, eos_id: int, preds: np.ndarray) -> list[str]:
    out = []
    for row in preds:
        toks = []
        for t in row.tolist():
            if t == eos_id:
                break
            toks.append(t)
        out.append(tokenizer.decode_single(toks))
    return out


class EvalRunner:
    """Owns the jitted decode/loss functions and the per-run scorer state
    (one ``AllMetrics`` per run — FENSE model load + Java setup are costly;
    every ``testing.run`` pass shares it)."""

    def __init__(
        self,
        *,
        dm,
        tokenizer,
        model_cfg,
        run_dir: str,
        logger,
        forbid,
        gen_val: str = "generate",
        gen_test: str = "generate",
        lim_val: Optional[int] = None,
        lim_test: Optional[int] = None,
        monitor: str = "val/fense",
    ) -> None:
        import jax

        from conette_tpu.train.evaluation import Validator
        from conette_tpu.train.objective import per_ref_losses, validation_loss

        self.dm = dm
        self.tokenizer = tokenizer
        self.model_cfg = model_cfg
        self.run_dir = run_dir
        self.logger = logger
        self.forbid = forbid
        self.lim_val = lim_val
        self.lim_test = lim_test
        self.gen_fn = make_gen_fn(model_cfg, method=gen_val)
        self.gen_fn_test = (
            self.gen_fn
            if gen_test == gen_val
            else make_gen_fn(model_cfg, method=gen_test)
        )
        self.val_loss_fn = jax.jit(
            lambda p, batch: validation_loss(p, model_cfg, batch)
        )
        self.test_losses_fn = jax.jit(
            lambda p, batch: per_ref_losses(p, model_cfg, batch)
        )
        self.validator = Validator(monitors=(monitor,))
        self._test_metrics: list[Any] = []

    # ------------------------------------------------------------ validation
    def run_validation(self, params, epoch: int) -> dict:
        import jax.numpy as jnp

        self.validator.reset()
        val_losses = []
        for j, b in enumerate(self.dm.eval_batches("val")):
            if self.lim_val is not None and j >= self.lim_val:
                break
            vb = {
                "audio": jnp.asarray(b["audio"]),
                "audio_lens": jnp.asarray(b["audio_lens"]),
                "mult_captions": jnp.asarray(b["mult_captions"]),
            }
            val_losses.append(float(self.val_loss_fn(params, vb)))
            bos = jnp.asarray(b["mult_captions"][:, 0, 0])
            preds, _, _, _ = self.gen_fn(
                params, vb["audio"], vb["audio_lens"], bos, self.forbid
            )
            cands = decode_preds(
                self.tokenizer, self.model_cfg.eos_id, np.asarray(preds)
            )
            self.validator.add_batch(cands, b["mult_references"])
        metrics = self.validator.compute()
        metrics["val/loss"] = float(np.mean(val_losses)) if val_losses else 0.0
        return metrics

    # ------------------------------------------------------------- test/pred
    def _decode_and_score_batch(
        self, evaluator, params, b, default_subset: str, with_losses: bool
    ) -> None:
        import jax.numpy as jnp

        audio = jnp.asarray(b["audio"])
        lens = jnp.asarray(b["audio_lens"])
        bos = jnp.asarray(b["mult_captions"][:, 0, 0])
        preds, lprobs, mpreds, mlprobs = self.gen_fn_test(
            params, audio, lens, bos, self.forbid
        )
        cands = decode_preds(self.tokenizer, self.model_cfg.eos_id, np.asarray(preds))
        mp = np.asarray(mpreds)
        mcands = [
            decode_preds(self.tokenizer, self.model_cfg.eos_id, mp[i])
            for i in range(mp.shape[0])
        ]
        losses = None
        if with_losses:
            # per-(clip, ref) forced losses — the reference's `losses`
            # CSV column (test_step, conette.py:293-350)
            loss_mat, loss_valid = self.test_losses_fn(
                params,
                {
                    "audio": audio,
                    "audio_lens": lens,
                    "mult_captions": jnp.asarray(b["mult_captions"]),
                },
            )
            losses = [
                [float(x) for x, ok in zip(row, okr) if ok]
                for row, okr in zip(np.asarray(loss_mat), np.asarray(loss_valid))
            ]
        evaluator.add_batch(
            cands,
            b["mult_references"],
            fnames=b.get("fname"),
            dataset=b["dataset"][0] if b.get("dataset") else "unknown",
            subset=b["subset"][0] if b.get("subset") else default_subset,
            lprobs=np.asarray(lprobs),
            preds=np.asarray(preds),
            mpreds=mp,
            mlprobs=np.asarray(mlprobs),
            mcands=mcands,
            losses=losses,
        )

    def run_test(self, model_name: str, params) -> dict[str, Any]:
        from conette_tpu.train.evaluation import Evaluator, make_metric_tokenizer

        scores: dict[str, Any] = {}
        if self.dm.num_eval_loaders("test") > 0:
            if not self._test_metrics:
                from conette_tpu.metrics import AllMetrics

                self._test_metrics.append(
                    AllMetrics(
                        tokenizer=make_metric_tokenizer(),
                        train_vocab=list(self.tokenizer.get_vocab()),
                    )
                )
            evaluator = Evaluator(
                self.run_dir, model_name=model_name, metrics=self._test_metrics[0]
            )
            for dl_idx in range(self.dm.num_eval_loaders("test")):
                for j, b in enumerate(self.dm.eval_batches("test", dl_idx)):
                    if self.lim_test is not None and j >= self.lim_test:
                        break
                    self._decode_and_score_batch(
                        evaluator, params, b, "test", with_losses=True
                    )
            scores = evaluator.compute_and_export()
            for corpus, corpus_scores in scores.items():
                self.logger.log_metrics(
                    {
                        f"test/{model_name}/{corpus}/{k}": v
                        for k, v in corpus_scores.items()
                    }
                )
        # predict pass: decode-and-export only (the reference calls
        # trainer.predict after every trainer.test, train.py:303-343;
        # predict corpora like clotho_test have no references — the
        # artifacts are the outputs CSV + DCASE submission CSV)
        if self.dm.num_eval_loaders("predict") > 0:
            from conette_tpu.train.evaluation import Evaluator as _Evaluator

            pred_eval = _Evaluator(self.run_dir, model_name=model_name, score=False)
            for dl_idx in range(self.dm.num_eval_loaders("predict")):
                for b in self.dm.eval_batches("predict", dl_idx):
                    self._decode_and_score_batch(
                        pred_eval, params, b, "predict", with_losses=False
                    )
            pred_eval.compute_and_export()
        return scores
