"""``generate-scene-graph`` entry point — sample scene graphs from a trained
checkpoint, optionally scoring recall@k against ground truth.

Reference equivalent (SURVEY.md §3.3): restore checkpoint → k noise draws per
test image → argmax triples → dedupe/aggregate → write out. TPU redesign: all
k samples × a whole image batch are one compiled dispatch.

  python -m sgg.cli.generate --workdir /tmp/run --out graphs.json \
      --num-samples 50 --recall-k 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

from sgg.cli.common import add_platform_arg, apply_platform, load_dataset
from sgg.config import Config
from sgg.data.vocab import Vocab
from sgg.eval import assemble_scene_graphs, corpus_recall, make_sampler
from sgg.train.checkpoint import CheckpointManager, load_workdir
from sgg.train.state import create_train_state


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True, help="training run directory")
    p.add_argument("--out", default=None, help="output JSON path (default: workdir/scene_graphs.json)")
    p.add_argument("--num-samples", type=int, default=50, help="noise draws per image")
    p.add_argument("--temperature", type=float, default=None,
                   help="sampling temperature: tokens ~ softmax(logits / T) "
                        "(default 1.0 = the model's own distribution). "
                        "Higher = more diverse triples, lower = mode-seeking")
    p.add_argument("--top-p", type=float, default=None,
                   help="nucleus sampling: keep the smallest token set with "
                        "cumulative probability >= p at each decode step "
                        "(applied to the tempered distribution; XLA decode "
                        "only)")
    p.add_argument("--top-k", type=int, default=0,
                   help="top-k sampling: keep only the k most likely tokens "
                        "at each decode step (0 = off; XLA decode only)")
    p.add_argument("--rank", default="freq",
                   choices=["freq", "freq_logp", "logp"],
                   help="triple confidence order: sample frequency (freq, "
                        "ties lexicographic), frequency with model log-prob "
                        "tiebreak (freq_logp), or pure model probability "
                        "mass (logp) — see sgg.eval.rank_triples")
    p.add_argument("--num-images", type=int, default=None, help="limit images")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--recall-k", type=int, default=None, help="also report recall@k vs ground truth")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--split", default="test", choices=["train", "test"],
                   help="evaluate on held-out shards when available (default)")
    p.add_argument("--quant", default=None, choices=["none", "int8"],
                   help="encoder PTQ mode (overrides cfg.model.quant): int8 "
                        "runs the backbone s8×s8→s32 on the MXU")
    p.add_argument("--decode", default="xla", choices=["xla", "fused"],
                   help="decode path: 'xla' = vmapped generator.apply, "
                        "'fused' = one Pallas program per draw with decoder "
                        "weights VMEM-resident (bit-identical tokens; see "
                        "BASELINE.md fused-decode table for when it wins)")
    p.add_argument("--ema", action="store_true",
                   help="sample from the EMA generator weights (requires a "
                        "run trained with train.ema_decay > 0)")
    p.add_argument("--avg-last", type=int, default=0, metavar="N",
                   help="tail-average (offline SWA) the generator weights "
                        "over the last N retained checkpoints; composes "
                        "with --ema (see sgg.cli.evaluate --avg-last)")
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)

    cfg, vocab = load_workdir(args.workdir)
    cfg.model.vocab_size = len(vocab)
    ds, _ = load_dataset(cfg, split=args.split)
    n_images = min(args.num_images or len(ds), len(ds))

    state = create_train_state(cfg, jax.random.key(0))
    ckpt = CheckpointManager(args.workdir, cfg)
    if args.avg_last > 1:
        restored = ckpt.restore_averaged(state, args.avg_last)
    else:
        restored = ckpt.restore(state)
    if restored is None:
        print(f"[sgg.generate] no checkpoint in {args.workdir}", file=sys.stderr)
        return 1
    state = restored
    avg_s = (f" (generator averaged over last "
             f"{min(args.avg_last, len(ckpt.all_steps()))} checkpoints)"
             if args.avg_last > 1 else "")
    print(f"[sgg.generate] restored step {int(state.step)}{avg_s}", flush=True)
    g_params = state.g_params
    if args.ema:
        if state.g_ema is None:
            print(
                "[sgg.generate] --ema: checkpoint has no EMA weights "
                "(train with train.ema_decay > 0)",
                file=sys.stderr,
            )
            return 1
        g_params = state.g_ema

    rng = jax.random.key(args.seed)

    # End-to-end configs: run the backbone (from the checkpoint's
    # enc_params) on images to produce the features the decoder attends over.
    end_to_end = cfg.model.encoder != "precomputed"
    quant = None if args.quant is None else (
        "" if args.quant == "none" else args.quant)
    from sgg.cli.common import make_batch_features

    batch_features = make_batch_features(cfg, ds, state.enc_params, quant=quant)

    # Device-resident fast path: upload the whole feature set to HBM once
    # (chunked — BASELINE.md documents the relay's large-transfer cliff) and
    # gather per-batch by index inside the jitted sampler. Per-batch host↔
    # device traffic drops from a [B,R,F] slab to B indices + B·K·3 tokens.
    from sgg.eval.sampler import (
        device_put_features,
        make_fused_sampler,
        make_indexed_sampler,
    )

    B = args.batch_size
    with_logp = args.rank != "freq"
    filt = dict(top_k=args.top_k or 0, top_p=args.top_p)
    if (filt["top_k"] or filt["top_p"] is not None) and args.decode == "fused":
        print(
            "[sgg.generate] --top-k/--top-p filter the sampling "
            "distribution, which the fused kernel does not implement; use "
            "--decode xla",
            file=sys.stderr,
        )
        return 2
    if with_logp and args.decode == "fused":
        print(
            "[sgg.generate] --rank freq_logp/logp needs per-draw log-probs, "
            "which the fused kernel does not emit; use --decode xla",
            file=sys.stderr,
        )
        return 2
    device_resident = (
        not end_to_end
        and hasattr(ds, "features")
        and ds.features.nbytes <= cfg.data.device_resident_max_bytes
    )
    t_up = 0.0
    if device_resident:
        t0 = time.perf_counter()
        feats_dev = device_put_features(ds.features, dtype=cfg.model.dtype)
        jax.block_until_ready(feats_dev)
        t_up = time.perf_counter() - t0
        if args.decode == "fused":
            sampler = make_fused_sampler(
                cfg, step_mask=vocab.step_mask(),
                num_samples=args.num_samples, tau=args.temperature,
                indexed=True,
            )
        else:
            sampler = make_indexed_sampler(
                cfg, step_mask=vocab.step_mask(),
                num_samples=args.num_samples, tau=args.temperature,
                with_logp=with_logp, **filt,
            )
    elif args.decode == "fused":
        sampler = make_fused_sampler(
            cfg, step_mask=vocab.step_mask(), num_samples=args.num_samples,
            tau=args.temperature,
        )
    else:
        sampler = make_sampler(
            cfg, step_mask=vocab.step_mask(), num_samples=args.num_samples,
            tau=args.temperature, with_logp=with_logp, **filt,
        )

    # Pipeline dispatches: issue the sampler for batch i+1 before reading
    # batch i back — on relay-attached TPUs the per-dispatch round-trip
    # otherwise serializes with compute.
    def dispatch(lo):
        nonlocal rng
        idx = np.arange(lo, min(lo + B, n_images))
        rng, sub = jax.random.split(rng)
        if device_resident:
            pad_idx = (
                np.concatenate([idx, np.repeat(idx[-1:], B - len(idx))])
                if len(idx) < B else idx
            )
            fut = sampler(g_params, feats_dev, pad_idx, sub)
        else:
            feats = batch_features(idx)
            if feats.shape[0] < B:  # pad to the compiled batch shape
                pad = np.repeat(feats[-1:], B - feats.shape[0], axis=0)
                feats = np.concatenate([feats, pad], axis=0)
            fut = sampler(g_params, feats, sub)
        return idx, fut  # async device call

    graphs, gen_triples, gt_triples = [], [], []
    n_sampled = 0
    starts = list(range(0, n_images, B))
    if starts:  # warm the compile outside the throughput window
        jax.block_until_ready(dispatch(starts[0])[1])
    t0 = time.perf_counter()
    pending = dispatch(starts[0]) if starts else None
    for pos, lo in enumerate(starts):
        idx, fut = pending
        pending = dispatch(starts[pos + 1]) if pos + 1 < len(starts) else None
        if with_logp:
            tokens, logp = (np.asarray(x) for x in fut)  # sync point
            logp = logp[: len(idx)]
        else:
            tokens, logp = np.asarray(fut), None  # [B, K, 3] — sync point
        gs, ids = assemble_scene_graphs(
            tokens[: len(idx)], vocab, idx, logp=logp, rank=args.rank
        )
        graphs.extend(gs)
        gen_triples.extend(ids)
        gt_triples.extend(
            [tuple(map(int, t)) for t in ds.triples[i]] for i in idx
        )
        n_sampled += len(idx) * tokens.shape[1]
    dt = time.perf_counter() - t0

    out_path = args.out or os.path.join(args.workdir, "scene_graphs.json")
    with open(out_path, "w") as f:
        json.dump({"num_images": n_images, "scene_graphs": graphs}, f, indent=2)
    triples_per_sec = n_sampled / dt if dt > 0 else 0.0
    up = f" (+{t_up:.2f}s one-time feature upload)" if t_up else ""
    print(
        f"[sgg.generate] {n_images} images, {n_sampled} triples in {dt:.2f}s "
        f"({triples_per_sec:.0f} triples/sec){up} → {out_path}",
        flush=True,
    )
    if args.recall_k:
        r = corpus_recall(gen_triples, gt_triples, k=args.recall_k)
        print(f"[sgg.generate] recall@{args.recall_k} = {r:.4f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
