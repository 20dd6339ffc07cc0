"""``pretrain`` entry point — supervised encoder pretraining on object labels.

Stands in for the reference's DOWNLOADED ImageNet VGG-19 weights
(SURVEY.md §2.1 #2) on machines without them: the VG relationships file
already names every image's objects, so object presence is a free supervised
task (sgg/train/pretrain.py rationale). Output is an ``encoder_params.npz``
that ``sgg.cli.preprocess --encoder-ckpt`` consumes exactly like
``--vgg-weights``.

  python -m sgg.cli.pretrain --vg-dir /data/vg --image-dir /data/vg/images \
      --out-dir /tmp/enc --steps 2000 --batch-size 64

TPU path: all images decode once on the host (native JPEG tier), upload
chunked into HBM as uint8, and every step is one compiled dispatch with an
on-device batch gather — the same zero-host-traffic recipe as the fused GAN
step.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from sgg.cli.common import add_platform_arg, apply_platform
from sgg.data.vg import (
    build_vocab_from_relationships,
    filter_and_encode,
    parse_entity_boxes,
    parse_relationships,
    train_test_split,
)
from sgg.data.vocab import Vocab


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vg-dir", required=True, help="dir with relationships.json")
    p.add_argument("--image-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--vocab", default=None,
                   help="existing vocab.json (e.g. from preprocess) so label "
                        "ids match the GAN vocabulary; default: build one "
                        "with preprocess's defaults")
    p.add_argument("--encoder", default="vgg19",
                   choices=["vgg19", "resnet50", "vit_b16"])
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--max-images", type=int, default=None,
                   help="subsample the train images (decode/HBM budget)")
    p.add_argument("--test-fraction", type=float, default=0.1)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--spatial", default="auto", choices=["auto", "on", "off"],
                   help="per-cell owner supervision from entity boxes "
                        "(grounded corpus / real VG): teaches what+WHERE, "
                        "which geometric predicates need. auto = on iff the "
                        "relationships carry boxes")
    p.add_argument("--spatial-weight", type=float, default=1.0)
    p.add_argument("--moe-experts", type=int, default=0,
                   help="vit_b16 only: swap each block's MLP for a top-k "
                        "MoE layer with this many experts (sgg.models.moe; "
                        "Switch aux loss applied at 0.01)")
    p.add_argument("--moe-top-k", type=int, default=2)
    p.add_argument("--vit-dims", default="768,12,12",
                   help="vit_b16 only: embed_dim,layers,heads "
                        "(default true B/16)")
    p.add_argument("--stall-exit-sec", type=int, default=900,
                   help="exit 86 when no step readback lands for this long "
                        "(the relay can hang a dispatch forever — a 40k-step "
                        "run once sat wedged for 80+ min; supervisors "
                        "relaunch on rc 86 and --checkpoint-every resumes). "
                        "0 disables")
    p.add_argument("--checkpoint-every", type=int, default=5000,
                   help="write a resume checkpoint (params+opt state+step) "
                        "every N steps; a relaunch continues from it. "
                        "0 disables")
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)

    rel_path = os.path.join(args.vg_dir, "relationships.json")
    if not os.path.exists(rel_path):
        print(f"[sgg.pretrain] missing {rel_path}", file=sys.stderr)
        return 1
    with open(rel_path) as f:  # load once — parsed twice (triples + boxes)
        rel_obj = json.load(f)
    images = parse_relationships(rel_obj)
    boxes = (
        parse_entity_boxes(rel_obj) if args.spatial != "off" else {}
    )
    del rel_obj
    have_boxes = any(boxes.values())
    spatial = args.spatial == "on" or (args.spatial == "auto" and have_boxes)
    if args.spatial == "on" and not have_boxes:
        print("[sgg.pretrain] --spatial on but no entity boxes in JSON",
              file=sys.stderr)
        return 1
    if args.vocab:
        vocab = Vocab.load(args.vocab)
    else:
        vocab = build_vocab_from_relationships(images)
    ids, enc = filter_and_encode(images, vocab)
    train_ids, test_ids = train_test_split(ids, args.test_fraction, args.seed)
    pos = {im: i for i, im in enumerate(ids)}
    if args.max_images is not None and len(train_ids) > args.max_images:
        rng = np.random.RandomState(args.seed)
        keep = rng.choice(len(train_ids), size=args.max_images, replace=False)
        train_ids = [train_ids[i] for i in sorted(keep)]
    # Held-out slice for the presence report (bounded decode cost).
    test_ids = test_ids[: max(64, args.batch_size)]
    print(
        f"[sgg.pretrain] {len(train_ids)} train / {len(test_ids)} held-out "
        f"images, vocab={len(vocab)}, encoder={args.encoder}",
        flush=True,
    )

    from sgg.data.extract import load_batch, resolve_image_paths
    from sgg.train.pretrain import (
        cell_labels,
        evaluate_presence,
        feature_grid,
        make_pretrain_state,
        make_pretrain_step,
        multi_hot_labels,
        save_params_npz,
    )

    t0 = time.time()
    train_paths = resolve_image_paths(train_ids, args.image_dir)
    test_paths = resolve_image_paths(test_ids, args.image_dir)
    imgs_host = np.empty(
        (len(train_paths), args.image_size, args.image_size, 3), np.uint8
    )
    for lo in range(0, len(train_paths), 256):
        imgs_host[lo : lo + 256] = load_batch(
            train_paths[lo : lo + 256], args.image_size
        )
        if lo % 5120 == 0 and lo:
            rate = lo / (time.time() - t0)
            print(f"[sgg.pretrain] decoded {lo}/{len(train_paths)} "
                  f"({rate:.0f}/s)", flush=True)
    test_imgs = load_batch(test_paths, args.image_size)
    labels_host = multi_hot_labels(
        [enc[pos[i]] for i in train_ids], len(vocab)
    )
    test_labels = multi_hot_labels([enc[pos[i]] for i in test_ids], len(vocab))
    cells_host = test_cells = None
    if spatial:
        from PIL import Image

        img_wh = Image.open(train_paths[0]).size  # corpus-constant (w, h)
        grid = feature_grid(args.encoder, args.image_size)
        cells_host = cell_labels(
            [boxes.get(i, []) for i in train_ids], vocab, grid, img_wh
        )
        test_cells = cell_labels(
            [boxes.get(i, []) for i in test_ids], vocab, grid, img_wh
        )
        fg = float((cells_host > 0).mean())
        print(
            f"[sgg.pretrain] spatial task ON: {grid}x{grid} cells, "
            f"{fg:.0%} foreground, image {img_wh[0]}x{img_wh[1]}",
            flush=True,
        )
    print(
        f"[sgg.pretrain] decoded {len(train_paths)} images in "
        f"{time.time() - t0:.0f}s ({imgs_host.nbytes / 1e9:.2f} GB)",
        flush=True,
    )

    from sgg.eval.sampler import device_put_features

    images_d = device_put_features(imgs_host)
    labels_d = device_put_features(labels_host)
    cells_d = device_put_features(cells_host) if spatial else None
    try:  # diagnostic: confirm the in-place upload peaked near store size
        ms = jax.devices()[0].memory_stats() or {}
        print(
            f"[sgg.pretrain] HBM in use "
            f"{ms.get('bytes_in_use', 0) / 1e9:.2f} GB / "
            f"limit {ms.get('bytes_limit', 0) / 1e9:.2f} GB",
            flush=True,
        )
    except Exception:
        pass

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, params, opt_state, tx = make_pretrain_state(
        args.encoder, len(vocab), image_size=args.image_size, lr=args.lr,
        use_pallas=jax.default_backend() == "tpu", dtype=dtype,
        seed=args.seed, moe_experts=args.moe_experts,
        moe_top_k=args.moe_top_k,
        vit_dims=tuple(int(v) for v in args.vit_dims.split(",")),
    )
    step_fn = make_pretrain_step(
        model, tx, args.batch_size, seed=args.seed, spatial=spatial,
        spatial_weight=args.spatial_weight,
    )

    n = len(train_paths)

    # Mid-run resume checkpoint: the flat leaf order of (params, opt_state)
    # is deterministic for a fixed model/optimizer, so a plain indexed npz
    # round-trips the exact pytrees.
    ckpt_path = os.path.join(args.out_dir, "pretrain_resume.npz")
    start = 0
    if args.checkpoint_every > 0 and os.path.exists(ckpt_path):
        leaves, treedef = jax.tree.flatten((params, opt_state))
        with np.load(ckpt_path) as z:
            start = int(z["step"])
            loaded = [jnp.asarray(z[f"a{j}"]) for j in range(len(leaves))]
        params, opt_state = jax.tree.unflatten(treedef, loaded)
        print(f"[sgg.pretrain] resumed at step {start} ← {ckpt_path}",
              flush=True)

    def save_resume(step_i, params, opt_state):
        leaves = jax.tree.leaves((params, opt_state))
        os.makedirs(args.out_dir, exist_ok=True)
        tmp = ckpt_path + ".tmp.npz"
        np.savez(tmp, step=step_i,
                 **{f"a{j}": np.asarray(l) for j, l in enumerate(leaves)})
        os.replace(tmp, ckpt_path)

    # Stall watchdog: the relay can hang a single dispatch FOREVER (0 CPU,
    # no error — observed 80+ min at step 31k of a 40k run). No in-process
    # recovery is possible from a wedged C++ call, so exit 86 and let the
    # supervisor relaunch into the resume checkpoint.
    progress = {"t": time.time()}
    if args.stall_exit_sec > 0:
        import threading

        def _watchdog():
            while True:
                time.sleep(30)
                dt = time.time() - progress["t"]
                if dt > args.stall_exit_sec:
                    print(
                        f"[sgg.pretrain] STALL: no step readback for "
                        f"{dt:.0f}s (relay hang?) — exit 86 for relaunch",
                        flush=True,
                    )
                    os._exit(86)

        threading.Thread(target=_watchdog, daemon=True).start()

    t0 = time.time()
    metrics = {}
    for i in range(start, args.steps):
        if spatial:
            params, opt_state, metrics = step_fn(
                params, opt_state, images_d, labels_d, cells_d, n, i
            )
        else:
            params, opt_state, metrics = step_fn(
                params, opt_state, images_d, labels_d, n, i
            )
        if (i + 1) % args.log_every == 0 or i + 1 == args.steps:
            loss = float(metrics["loss"])
            rec = float(metrics["presence_recall"])
            cell = (
                f" cell_acc={float(metrics['cell_acc']):.3f}" if spatial else ""
            )
            rate = (i + 1 - start) * args.batch_size / (time.time() - t0)
            print(
                f"[sgg.pretrain] step {i + 1}: loss={loss:.4f} "
                f"presence_recall={rec:.3f}{cell} img/s={rate:.0f}",
                flush=True,
            )
            progress["t"] = time.time()
        if args.checkpoint_every > 0 and (i + 1) % args.checkpoint_every == 0 \
                and i + 1 < args.steps:
            save_resume(i + 1, params, opt_state)
            print(f"[sgg.pretrain] resume checkpoint @ {i + 1}", flush=True)

    report = evaluate_presence(
        model, params, test_imgs, test_labels, batch_size=args.batch_size,
        cells=test_cells,
    )
    cell = f" cell_acc={report['cell_acc']:.3f}" if spatial else ""
    print(
        f"[sgg.pretrain] held-out: loss={report['loss']:.4f} "
        f"presence_recall={report['presence_recall']:.3f} "
        f"precision@k={report['precision_at_k']:.3f}{cell}",
        flush=True,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    out_npz = os.path.join(args.out_dir, "encoder_params.npz")
    save_params_npz(out_npz, jax.tree.map(np.asarray, params["encoder"]))
    vocab.save(os.path.join(args.out_dir, "vocab.json"))
    with open(os.path.join(args.out_dir, "pretrain_meta.json"), "w") as f:
        json.dump(
            {
                "encoder": args.encoder,
                "image_size": args.image_size,
                "vit_dims": [int(v) for v in args.vit_dims.split(",")],
                "moe_experts": args.moe_experts,
                "moe_top_k": args.moe_top_k,
                "steps": args.steps,
                "train_images": n,
                "spatial": spatial,
                "held_out": report,
            },
            f,
            indent=2,
        )
    print(f"[sgg.pretrain] encoder params → {out_npz}", flush=True)
    if os.path.exists(ckpt_path):
        os.remove(ckpt_path)  # the run is complete; the final npz is the product
    return 0


if __name__ == "__main__":
    sys.exit(main())
