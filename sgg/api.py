"""High-level library API: one object from workdir to scene graphs.

The "switch from the reference" entry point for library users (the CLIs
wrap the same pieces): load a trained run's self-describing workdir and turn
images or precomputed features into deduped scene graphs.

    from sgg.api import SceneGraphGenerator
    g = SceneGraphGenerator.from_workdir("/runs/vg1k")
    graphs = g.generate_from_features(feats)          # [B, R, F]
    graphs = g.generate_from_images(images_u8)        # [B, H, W, 3] (encoder configs)
    graphs = g.generate_from_paths(["img1.jpg", …])
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgg.eval import assemble_scene_graph, make_sampler, rank_triples
from sgg.train.checkpoint import CheckpointManager, load_workdir
from sgg.train.state import create_train_state


class SceneGraphGenerator:
    def __init__(self, cfg, vocab, state, num_samples: int = 50, seed: int = 0,
                 temperature: float | None = None, rank: str = "freq"):
        self.cfg = cfg
        self.vocab = vocab
        self.state = state
        self.num_samples = num_samples
        self.rank = rank
        self._rng = jax.random.key(seed)
        self._sampler = make_sampler(
            cfg, step_mask=vocab.step_mask(), num_samples=num_samples,
            tau=temperature, with_logp=rank != "freq",
        )
        self._encode = None
        if cfg.model.encoder != "precomputed":
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
            def encode(params, images_u8):
                return enc.apply(params, normalize_for(cfg.model.encoder, images_u8))

            self._encode = encode

    @classmethod
    def from_workdir(
        cls, workdir: str, num_samples: int = 50, seed: int = 0,
        temperature: float | None = None, rank: str = "freq",
        avg_last: int = 0,
    ) -> "SceneGraphGenerator":
        """``temperature``: tokens ~ softmax(logits/T), default 1.0.
        ``rank``: triple confidence order — 'freq' (sample count),
        'freq_logp', or 'logp' (see :func:`sgg.eval.rank_triples`).
        ``avg_last`` > 1: offline-SWA tail average of the last N retained
        checkpoints' generator weights
        (:meth:`CheckpointManager.restore_averaged`)."""
        cfg, vocab = load_workdir(workdir)
        cfg.model.vocab_size = len(vocab)
        state = create_train_state(cfg, jax.random.key(0))
        mgr = CheckpointManager(workdir, cfg)
        if avg_last > 1:
            restored = mgr.restore_averaged(state, avg_last)
        else:
            restored = mgr.restore(state)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {workdir}")
        return cls(cfg, vocab, restored, num_samples=num_samples, seed=seed,
                   temperature=temperature, rank=rank)

    # ------------------------------------------------------------- generate
    def generate_from_features(self, feats,
                               temperature=None) -> list[dict]:
        """float[B, R, F] → per-image scene-graph dicts (ranked triples).

        ``temperature`` overrides the constructor default for this call
        only — scalar or per-row float[B]; temperature is a traced operand
        of the one compiled sampler, so overrides never recompile."""
        feats = jnp.asarray(feats, self.cfg.model.dtype)
        self._rng, sub = jax.random.split(self._rng)
        out = self._sampler(self.state.g_params, feats, sub, temperature)
        if self.rank == "freq":
            tokens = np.asarray(out)
            return [
                assemble_scene_graph(tokens[i], self.vocab)
                for i in range(len(tokens))
            ]
        tokens, logp = (np.asarray(x) for x in out)
        graphs = []
        for i in range(len(tokens)):
            ordered = rank_triples(tokens[i], logp[i], rank=self.rank)
            names = [self.vocab.decode_triple(t) for t in ordered]
            graphs.append({"triples": [
                {"subject": s, "predicate": p, "object": o}
                for (s, p, o) in names
            ]})
        return graphs

    def generate_from_images(self, images_u8, temperature=None) -> list[dict]:
        """uint8[B, H, W, 3] → scene graphs (requires an encoder config)."""
        if self._encode is None:
            raise ValueError(
                "this run used precomputed features; call generate_from_features"
            )
        feats = self._encode(self.state.enc_params, jnp.asarray(images_u8))
        return self.generate_from_features(feats, temperature)

    def generate_from_paths(self, paths: list[str],
                            temperature=None) -> list[dict]:
        from sgg.data.extract import load_batch

        return self.generate_from_images(
            load_batch(list(paths), self.cfg.data.image_size), temperature
        )
