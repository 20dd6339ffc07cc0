"""``preprocess`` entry point — VG filtering, vocab build, feature extraction.

Reference equivalent (SURVEY.md §3.1): parse relationships.json, filter
images, build the vocabulary, run each image through the conv backbone, and
write feature+triple shards. Output layout:

  out_dir/vocab.json
  out_dir/shard-00000-of-000NN.npz   (train split)
  out_dir/test/shard-*.npz           (held-out split)

Modes:
  --synthetic N        synthetic dataset (tests/benchmarks; no VG needed)
  --vg-dir DIR         real VG JSON; features from --encoder:
      vgg19            JAX VGG-19 over images (requires --image-dir and,
                       optionally, --vgg-weights .npy for pretrained weights)
      random           random features (pipeline smoke without images)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from sgg.data import (
    Vocab,
    build_vocab_from_relationships,
    filter_and_encode,
    parse_relationships,
    synthetic_dataset,
    write_feature_shard,
)
from sgg.data.shards import shard_name
from sgg.data.vg import train_test_split


def _write_split(out_dir, image_ids, feats, triples, shard_size):
    os.makedirs(out_dir, exist_ok=True)
    n = len(image_ids)
    total = max(1, -(-n // shard_size))
    for s in range(total):
        lo, hi = s * shard_size, min((s + 1) * shard_size, n)
        write_feature_shard(
            os.path.join(out_dir, shard_name(s, total)),
            np.asarray(image_ids[lo:hi], np.int32),
            feats[lo:hi],
            triples[lo:hi],
        )
    return total


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--synthetic", type=int, default=None, metavar="N",
                   help="generate N synthetic images instead of reading VG")
    p.add_argument("--vg-dir", default=None, help="directory with relationships.json")
    p.add_argument("--image-dir", default=None, help="directory with VG JPEGs")
    p.add_argument("--encoder", default="vgg19", choices=["vgg19", "random"])
    p.add_argument("--vgg-weights", default=None, help=".npy weight dict for VGG-19")
    p.add_argument("--encoder-ckpt", default=None,
                   help="sgg.cli.pretrain output (dir with encoder_params.npz"
                        " + pretrain_meta.json, or the .npz itself): extract "
                        "features with THESE weights — the offline stand-in "
                        "for --vgg-weights")
    p.add_argument("--max-objects", type=int, default=None)
    p.add_argument("--max-predicates", type=int, default=None)
    p.add_argument("--min-count", type=int, default=2)
    p.add_argument("--min-triples", type=int, default=1)
    p.add_argument("--max-triples-per-image", type=int, default=32)
    p.add_argument("--max-images", type=int, default=None,
                   help="subsample the kept images before the split "
                        "(bounds extraction time; deterministic by --seed)")
    p.add_argument("--test-fraction", type=float, default=0.1)
    p.add_argument("--shard-size", type=int, default=1024)
    p.add_argument("--regions", type=int, default=196)
    p.add_argument("--feat-dim", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=32, help="encoder batch")
    p.add_argument("--feat-dtype", default="float32",
                   choices=["float32", "float16"],
                   help="shard feature dtype (float16 halves storage/transfer)")
    p.add_argument("--seed", type=int, default=0)
    from sgg.cli.common import add_platform_arg, apply_platform

    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)

    os.makedirs(args.out_dir, exist_ok=True)

    if args.synthetic is not None:
        data = synthetic_dataset(
            num_images=args.synthetic, regions=args.regions,
            feat_dim=args.feat_dim, seed=args.seed, dtype=args.feat_dtype,
        )
        vocab = data["vocab"]
        vocab.save(os.path.join(args.out_dir, "vocab.json"))
        ids = list(range(args.synthetic))
        triples = [t for t in data["triples"]]
        n_test = int(round(args.synthetic * args.test_fraction))
        tr = slice(0, args.synthetic - n_test)
        te = slice(args.synthetic - n_test, args.synthetic)
        n_shards = _write_split(
            args.out_dir, ids[tr], data["features"][tr], triples[tr], args.shard_size
        )
        if n_test:
            _write_split(
                os.path.join(args.out_dir, "test"), ids[te],
                data["features"][te], triples[te], args.shard_size,
            )
        print(
            f"[sgg.preprocess] synthetic: {args.synthetic} images, "
            f"vocab={len(vocab)}, {n_shards} train shard(s) → {args.out_dir}",
            flush=True,
        )
        return 0

    if not args.vg_dir:
        p.error("either --synthetic N or --vg-dir is required")
    rel_path = os.path.join(args.vg_dir, "relationships.json")
    if not os.path.exists(rel_path):
        print(f"[sgg.preprocess] missing {rel_path}", file=sys.stderr)
        return 1

    print(f"[sgg.preprocess] parsing {rel_path} …", flush=True)
    images = parse_relationships(rel_path)
    vocab = build_vocab_from_relationships(
        images, max_objects=args.max_objects,
        max_predicates=args.max_predicates, min_count=args.min_count,
    )
    ids, enc = filter_and_encode(
        images, vocab, min_triples=args.min_triples,
        max_triples_per_image=args.max_triples_per_image,
    )
    print(
        f"[sgg.preprocess] kept {len(ids)}/{len(images)} images, vocab={len(vocab)}",
        flush=True,
    )
    if args.max_images is not None and len(ids) > args.max_images:
        # Subsample AFTER the vocab build (vocab reflects the full corpus)
        # but before the split, so train/test stay disjoint within the
        # subset. Deterministic in --seed.
        keep = np.random.RandomState(args.seed).choice(
            len(ids), size=args.max_images, replace=False
        )
        keep = sorted(keep)
        ids = [ids[i] for i in keep]
        enc = [enc[i] for i in keep]
        print(f"[sgg.preprocess] subsampled to {len(ids)} images", flush=True)

    train_ids, test_ids = train_test_split(ids, args.test_fraction, args.seed)
    pos = {im: i for i, im in enumerate(ids)}
    tr_idx = [pos[i] for i in train_ids]
    te_idx = [pos[i] for i in test_ids]

    if args.encoder == "random":
        rng = np.random.RandomState(args.seed)
        feats = rng.randn(len(ids), args.regions, args.feat_dim).astype(args.feat_dtype)
        n_shards = _write_split(
            args.out_dir, train_ids, feats[tr_idx], [enc[i] for i in tr_idx],
            args.shard_size,
        )
        if te_idx:
            _write_split(
                os.path.join(args.out_dir, "test"), test_ids, feats[te_idx],
                [enc[i] for i in te_idx], args.shard_size,
            )
        print(
            f"[sgg.preprocess] wrote {n_shards} train shard(s), "
            f"{len(test_ids)} test images → {args.out_dir}",
            flush=True,
        )
        return 0

    if not args.image_dir:
        print(
            "[sgg.preprocess] --encoder vgg19 requires --image-dir "
            "(use --encoder random for a pipeline smoke)",
            file=sys.stderr,
        )
        return 1
    # Real-image path STREAMS decode → encoder → shards with O(shard) host
    # memory: the in-RAM array would be 43 GB at full VG volume.
    from sgg.data.extract import extract_to_shards, resolve_image_paths

    params = None
    enc_name, image_size = "vgg19", 224
    vit_dims, moe_experts, moe_top_k = (768, 12, 12), 0, 2
    if args.vgg_weights:
        from sgg.models.vgg import load_npy_weights

        params = load_npy_weights(args.vgg_weights)
    elif args.encoder_ckpt:
        # Pretrained-on-this-corpus weights (sgg.cli.pretrain) — the offline
        # machine's equivalent of the reference's downloaded VGG .npy.
        from sgg.train.pretrain import load_params_npz

        ckpt = args.encoder_ckpt
        if os.path.isdir(ckpt):
            meta_path = os.path.join(ckpt, "pretrain_meta.json")
            if os.path.exists(meta_path):
                import json

                with open(meta_path) as f:
                    meta = json.load(f)
                enc_name = meta.get("encoder", enc_name)
                image_size = int(meta.get("image_size", image_size))
                vit_dims = tuple(meta.get("vit_dims", vit_dims))
                moe_experts = int(meta.get("moe_experts", moe_experts))
                moe_top_k = int(meta.get("moe_top_k", moe_top_k))
            ckpt = os.path.join(ckpt, "encoder_params.npz")
        params = {"params": load_params_npz(ckpt)}
        print(
            f"[sgg.preprocess] encoder weights ← {ckpt} "
            f"({enc_name} @ {image_size}px)",
            flush=True,
        )
    for split_name, split_ids, split_idx in (
        ("train", train_ids, tr_idx),
        ("test", test_ids, te_idx),
    ):
        if not split_ids:
            continue
        out = args.out_dir if split_name == "train" else os.path.join(
            args.out_dir, "test"
        )
        paths = resolve_image_paths(split_ids, args.image_dir)
        stats = extract_to_shards(
            enc_name, split_ids, paths, [enc[i] for i in split_idx], out,
            shard_size=args.shard_size, encoder_params=params,
            batch_size=args.batch_size, image_size=image_size,
            feat_dtype=np.dtype(args.feat_dtype),
            vit_dims=vit_dims, moe_experts=moe_experts, moe_top_k=moe_top_k,
        )
        print(f"[sgg.preprocess] {split_name}: {stats}", flush=True)
    # Written LAST deliberately: every pipeline script guards its extract
    # stage on vocab.json existence, so it must mean "extraction complete",
    # not "extraction started" — a killed extract once left a partial shard
    # dir whose early vocab.json would have skipped the stage with zero
    # shards (NOTES.md session-13 incident).
    vocab.save(os.path.join(args.out_dir, "vocab.json"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
