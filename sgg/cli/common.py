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
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)


def resolve_config(args: argparse.Namespace) -> Config:
    cfg = get_config(args.config)
    if args.overrides:
        cfg = cfg.override(args.overrides)
    if args.workdir:
        cfg.workdir = args.workdir
    return cfg


def load_dataset(cfg: Config) -> tuple[TripleDataset, Vocab]:
    """Build the training dataset + vocab from cfg.data.source."""
    d = cfg.data
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
