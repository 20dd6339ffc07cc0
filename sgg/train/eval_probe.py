"""Periodic held-out evaluation inside the train loop (``train.eval_every``).

Reference status: NONE — the reference validates offline only (run the
generation script against a checkpoint; SURVEY.md §4 "no test suite", §3.3).
This module gives the train loop the standard modern-framework probe:
every ``eval_every`` steps, decode ``eval_samples`` noise draws per image
for up to ``eval_images`` held-out images with the CURRENT generator
weights (EMA when the run tracks them — that is what inference will use)
and report recall@``eval_k`` next to the train losses. The best value seen
is tracked in ``workdir/best_eval.json`` with its step, so a long run's
peak checkpoint is identifiable without a separate eval sweep.

Design points:
- ONE compiled sampler and (for end-to-end configs) ONE compiled encoder
  pass, both built at init with params as ARGUMENTS — a probe never
  retraces, and fine-tuned encoder weights (train.train_encoder) flow in
  per call. First probe pays the one-off compile; later probes are pure
  device time.
- The probe rng is ``fold_in(eval seed, step)``: probes at different steps
  draw different noise (no lucky-seed overfitting to one draw set), while
  a re-run of the same run reproduces the same curve exactly.
- recall@k uses the same ``rank_triples``/``corpus_recall_multi`` path as
  ``sgg.cli.evaluate`` (frequency ranking), so in-loop numbers are directly
  comparable to the offline evaluation.
- Single-process only: the probe gathers tokens to the host. Multi-host
  runs keep their offline evaluation workflow (the train CLI skips the
  probe with a note rather than failing).
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

from sgg.config import Config


class EvalProbe:
    """Held-out recall probe bound to a config + vocab; call ``run(state)``."""

    def __init__(self, cfg: Config, vocab, log=None):
        from sgg.cli.common import load_dataset
        from sgg.eval import make_sampler

        self.cfg = cfg
        self.k = int(cfg.train.eval_k)
        self.log = log or (lambda m: None)
        ds, _ = load_dataset(cfg, split="test")
        n = min(int(cfg.train.eval_images) or len(ds), len(ds))
        self.n_images = n
        self.batch = min(cfg.train.batch_size, n)
        self.gt = [
            [tuple(int(x) for x in t) for t in ds.triples[i]] for i in range(n)
        ]
        if cfg.model.encoder == "precomputed":
            self._features = lambda idx, enc_params: ds.features[idx]
        else:
            from sgg.models.encoders import make_encoder, normalize_for

            enc = make_encoder(
                cfg.model.encoder, dtype=cfg.model.dtype,
                image_size=cfg.data.image_size,
                moe_experts=cfg.model.moe_experts,
                moe_top_k=cfg.model.moe_top_k,
                quant=cfg.model.quant,
                vit_dims=cfg.model.vit_dims,
            )

            @jax.jit
            def encode(p, images_u8):
                return enc.apply(p, normalize_for(cfg.model.encoder,
                                                  images_u8))

            def feats_fn(idx, enc_params):
                if hasattr(ds, "images"):  # in-memory uint8 images
                    imgs = ds.images[idx]
                else:  # path-backed dataset
                    from sgg.data.extract import load_batch

                    imgs = load_batch(
                        [ds.paths[int(i)] for i in idx], ds.image_size
                    )
                return np.asarray(encode(enc_params, imgs), np.float32)

            self._features = feats_fn
        self._sampler = make_sampler(
            cfg, step_mask=vocab.step_mask(),
            num_samples=int(cfg.train.eval_samples),
        )
        self._base_rng = jax.random.key(cfg.train.seed + 1)
        self.best = None  # (recall, step)
        self._best_path = os.path.join(cfg.workdir, "best_eval.json")
        if os.path.exists(self._best_path):
            try:
                with open(self._best_path) as f:
                    prev = json.load(f)
                self.best = (float(prev["recall"]), int(prev["step"]))
            except (ValueError, KeyError, OSError):
                pass  # unreadable best file: start fresh

    def run(self, state, step: int) -> dict:
        """Probe the current weights → {"eval_recall@k": v, "eval_seconds": s}.

        Samples with ``state.g_ema`` when the run tracks EMA weights (that
        is what ``--ema`` inference uses), else ``state.g_params``.
        """
        from sgg.eval import corpus_recall_multi, rank_triples

        t0 = time.perf_counter()
        g = state.g_ema if state.g_ema is not None else state.g_params
        rng = jax.random.fold_in(self._base_rng, step)
        B = self.batch
        gen_triples = []
        for lo in range(0, self.n_images, B):
            idx = np.arange(lo, min(lo + B, self.n_images))
            feats = self._features(idx, state.enc_params)
            if feats.shape[0] < B:
                feats = np.concatenate(
                    [feats, np.repeat(feats[-1:], B - feats.shape[0], axis=0)]
                )
            rng, sub = jax.random.split(rng)
            tokens = np.asarray(self._sampler(g, feats, sub))
            for j in range(len(idx)):
                gen_triples.append(rank_triples(tokens[j]))
        recall = corpus_recall_multi(gen_triples, self.gt, [self.k])[self.k]
        secs = time.perf_counter() - t0
        if self.best is None or recall > self.best[0]:
            self.best = (recall, step)
            tmp = self._best_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"recall": recall, "k": self.k, "step": step,
                     "images": self.n_images,
                     "samples": int(self.cfg.train.eval_samples),
                     "ema": state.g_ema is not None},
                    f,
                )
            os.replace(tmp, self._best_path)
        self.log(
            f"[sgg.train] eval step {step}: recall@{self.k} = {recall:.4f} "
            f"({self.n_images} held-out images, {secs:.1f}s; "
            f"best {self.best[0]:.4f} @ {self.best[1]})"
        )
        return {f"eval_recall@{self.k}": recall, "eval_seconds": secs}
