"""Shared CLI plumbing: config resolution and dataset loading."""

from __future__ import annotations

import argparse
import os

import numpy as np

from sgg.config import CONFIGS, Config, get_config
from sgg.data import TripleDataset, Vocab, list_shards, synthetic_dataset


def add_config_args(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--config", default="smoke", choices=sorted(CONFIGS),
        help="named config (BASELINE.json configs)",
    )
    p.add_argument(
        "--config-file", default=None,
        help="JSON config file (overrides --config; see configs/)",
    )
    p.add_argument(
        "--set", dest="overrides", action="append", default=[],
        metavar="SECTION.FIELD=VALUE",
        help="config override, e.g. --set train.batch_size=64 (repeatable)",
    )
    p.add_argument("--workdir", default=None, help="run directory")
    add_platform_arg(p)


def add_platform_arg(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--platform", default=None, choices=["cpu", "tpu", "axon"],
        help="force a JAX platform (this machine's TPU plugin registers "
        "eagerly, so JAX_PLATFORMS alone cannot select cpu)",
    )


def apply_platform(args: argparse.Namespace) -> None:
    """Must run before any JAX backend use."""
    import jax

    if (
        getattr(args, "platform", None) == "axon"
        or (not getattr(args, "platform", None)
            and os.environ.get("JAX_PLATFORMS") == "axon")
    ):
        # sitecustomize swallows relay-plugin registration failures, which
        # leaves this process with NO 'axon' backend factory and a
        # guaranteed crash at first device use ("Backend 'axon' is not in
        # the list of known backends: ['cpu', 'tpu']" — killed a round-3
        # training run at its first device_put, minutes after a clean
        # startup). Heal it before anything initializes the backend
        # (sgg/utils/axon.py has the full pathology); fail fast with the
        # real story if unhealable.
        from sgg.utils.axon import ensure_axon_registered

        if not ensure_axon_registered():
            raise RuntimeError(
                "relay PJRT plugin could not be (re-)registered — terminal "
                "groups are likely claimed/wedged; wait out the ~5-10 min "
                "claim window and retry (sgg/utils/axon.py)"
            )
    if getattr(args, "platform", None):
        # NB: 'axon' is the plugin's registry key (its client self-reports
        # platform 'tpu'); naming it explicitly also skips the real libtpu
        # 'tpu' factory, whose init hangs on this relay-only host — never
        # leave jax_platforms on auto-select here.
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "platform", None) in (None, "axon", "tpu"):
        # A wedged relay terminal hangs client init forever; pin a live one
        # (sgg/utils/axon.py) before the backend initializes.
        try:
            from sgg.utils.axon import ensure_live_terminal

            ensure_live_terminal()
        except Exception:
            pass
    # Persistent compilation cache: repeat CLI launches (train resume,
    # generate, evaluate) skip recompiling unchanged programs. Measured
    # caveat: hosts whose TPU compiles remotely (this machine's axon relay
    # AOT-compiles in the terminal helper) bypass the local cache — there a
    # cold sampler compile stays ~4 min per invocation regardless.
    try:
        cache_dir = os.environ.get(
            "SGG_JAX_CACHE", os.path.expanduser("~/.cache/sgg_jax")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is best-effort; older jaxlibs differ


def resolve_config(args: argparse.Namespace) -> Config:
    if getattr(args, "config_file", None):
        with open(args.config_file) as f:
            cfg = Config.from_json(f.read())
    else:
        cfg = get_config(args.config)
    if args.overrides:
        cfg = cfg.override(args.overrides)
    if args.workdir:
        cfg.workdir = args.workdir
    return cfg


def load_dataset(cfg: Config, split: str = "train"):
    """Build the dataset + vocab from cfg.data.source.

    Precomputed-feature configs return a TripleDataset; end-to-end encoder
    configs return an image-backed dataset (same iterator contract).
    ``split='test'`` reads the held-out shards written by preprocess
    (``data_dir/test``); sources without a materialized split fall back to
    the full set.
    """
    d = cfg.data
    if cfg.model.encoder != "precomputed":
        return _load_image_dataset(cfg, split=split)
    if d.source == "shards" and split == "test":
        test_dir = os.path.join(d.data_dir, "test")
        if list_shards(test_dir):
            vocab_path = d.vocab_path or os.path.join(d.data_dir, "vocab.json")
            return TripleDataset.from_shards(list_shards(test_dir)), Vocab.load(
                vocab_path
            )
    if d.source == "synthetic":
        data = synthetic_dataset(
            num_images=d.num_synthetic_images,
            regions=d.regions,
            feat_dim=d.feat_dim,
            seed=cfg.train.seed,
        )
        ds = TripleDataset(features=data["features"], triples=data["triples"])
        return ds, data["vocab"]
    if d.source == "shards":
        if not d.data_dir:
            raise ValueError("data.source=shards requires data.data_dir")
        shards = list_shards(d.data_dir)
        if not shards:
            raise FileNotFoundError(f"no feature shards in {d.data_dir}")
        vocab_path = d.vocab_path or os.path.join(d.data_dir, "vocab.json")
        vocab = Vocab.load(vocab_path)
        ds = TripleDataset.from_shards(shards)
        return ds, vocab
    raise ValueError(
        f"unsupported data.source {d.source!r} for this entry point "
        "(use 'synthetic' or 'shards'; run sgg.cli.preprocess first for VG)"
    )


def _load_image_dataset(cfg: Config, split: str = "train"):
    """Datasets for end-to-end (on-device feature) training [B:8].

    The ``vg`` source applies the SAME deterministic image-id split as
    sgg.cli.preprocess (``train_test_split`` seeded by data.split_seed, which
    must equal preprocess's --seed) so end-to-end runs hold out the same
    images as precomputed-shards runs — ``--split test`` on an end-to-end
    config evaluates genuinely unseen images, not training data. The
    synthetic source has no materialized split and returns the full set.
    """
    import numpy as np

    from sgg.data.images import ArrayImageTripleDataset, ImageTripleDataset

    d = cfg.data
    if d.source == "synthetic":
        data = synthetic_dataset(
            num_images=d.num_synthetic_images, regions=1, feat_dim=1,
            seed=cfg.train.seed,
        )
        rng = np.random.RandomState(cfg.train.seed)
        images = rng.randint(
            0, 256, size=(d.num_synthetic_images, d.image_size, d.image_size, 3),
            dtype=np.uint8,
        )
        return (
            ArrayImageTripleDataset(images=images, triples=data["triples"]),
            data["vocab"],
        )
    if d.source == "vg":
        from sgg.data.extract import resolve_image_paths
        from sgg.data.vg import (
            build_vocab_from_relationships,
            filter_and_encode,
            parse_relationships,
        )

        if not d.data_dir:
            raise ValueError("data.source=vg requires data.data_dir")
        rel = os.path.join(d.data_dir, "relationships.json")
        images = parse_relationships(rel)
        if d.vocab_path:
            vocab = Vocab.load(d.vocab_path)
        else:
            vocab = build_vocab_from_relationships(images, min_count=2)
        ids, enc = filter_and_encode(
            images, vocab, max_triples_per_image=d.max_triples_per_image
        )
        from sgg.data.vg import train_test_split

        train_ids, test_ids = train_test_split(
            ids, d.test_fraction, seed=d.split_seed
        )
        keep = set(test_ids if split == "test" else train_ids)
        sel = [j for j, i in enumerate(ids) if i in keep]
        if d.max_images and len(sel) > d.max_images:
            # Deterministic subsample, shuffled by split_seed so the cap
            # doesn't bias toward the corpus's file order.
            rng = np.random.RandomState(d.split_seed)
            pick = rng.permutation(len(sel))[: d.max_images]
            sel = [sel[j] for j in sorted(pick)]
        ids = [ids[j] for j in sel]
        enc = [enc[j] for j in sel]
        paths = resolve_image_paths(ids, os.path.join(d.data_dir, "images"))
        return (
            ImageTripleDataset(paths=paths, triples=enc, image_size=d.image_size),
            vocab,
        )
    raise ValueError(f"unsupported data.source {d.source!r} for encoder configs")


def make_batch_features(cfg: Config, ds, enc_params, quant: str | None = None):
    """features-for-indices fn shared by generate/evaluate.

    Precomputed configs index the dataset's feature array directly;
    end-to-end configs run the checkpoint's backbone on device per batch
    (in-memory uint8 images or lazily decoded paths). ``quant`` overrides
    cfg.model.quant ('' disables, 'int8' forces PTQ).
    """
    if cfg.model.encoder == "precomputed":
        return lambda idx: ds.features[idx]

    import jax

    from sgg.models.encoders import make_encoder, normalize_for

    enc = make_encoder(
        cfg.model.encoder, dtype=cfg.model.dtype,
        image_size=cfg.data.image_size,
        moe_experts=cfg.model.moe_experts,
        moe_top_k=cfg.model.moe_top_k,
        quant=cfg.model.quant if quant is None else quant,
        vit_dims=cfg.model.vit_dims,
    )

    @jax.jit
    def encode(p, images_u8):
        x = normalize_for(cfg.model.encoder, images_u8)
        return enc.apply(p, x)

    def batch_features(idx):
        if hasattr(ds, "images"):  # in-memory uint8 images
            imgs = ds.images[idx]
        else:  # path-backed dataset
            from sgg.data.extract import load_batch

            imgs = load_batch([ds.paths[int(i)] for i in idx], ds.image_size)
        return np.asarray(encode(enc_params, imgs), np.float32)

    return batch_features
