"""``export`` entry point — package a trained sampler as one AOT artifact.

The deployment surface beyond checkpoints (sgg/export.py): the compiled
StableHLO inference program + generator weights + vocab in a single .npz
a serving host loads with jax + numpy alone — no sgg model code.

  python -m sgg.cli.export --workdir /runs/vg1k --out model.sgx --check
  python -m sgg.cli.export --workdir /runs/vg1k --platforms cpu,tpu

``--check`` round-trips the artifact through ``load_artifact`` and asserts
its tokens are bit-identical to the live sampler on a fixed batch.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

from sgg.cli.common import add_platform_arg, apply_platform
from sgg.train.checkpoint import CheckpointManager, load_workdir
from sgg.train.state import create_train_state


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True, help="trained run directory")
    p.add_argument("--out", default=None,
                   help="artifact path (default: workdir/model.sgx)")
    p.add_argument("--batch-size", type=int, default=32,
                   help="compiled batch (requests pad to it, like serve); "
                        "0 = shape-polymorphic (any batch, one compile per "
                        "distinct size at load time)")
    p.add_argument("--num-samples", type=int, default=50,
                   help="noise draws per image baked into the program")
    p.add_argument("--temperature", type=float, default=None,
                   help="sampling temperature: tokens ~ softmax(logits / T) "
                        "(default 1.0)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets in one artifact")
    p.add_argument("--with-encoder", action="store_true",
                   help="encoder configs: bake the frozen backbone into the "
                        "artifact — pixels in, scene graphs out")
    p.add_argument("--quant", default=None, choices=["none", "int8"],
                   help="with --with-encoder: PTQ mode for the baked "
                        "backbone (overrides cfg.model.quant)")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and assert bit-identical "
                        "tokens vs the live sampler")
    p.add_argument("--ema", action="store_true",
                   help="bake the EMA generator weights into the artifact "
                        "(requires a run trained with train.ema_decay > 0)")
    p.add_argument("--avg-last", type=int, default=0, metavar="N",
                   help="bake the tail-average (offline SWA) of the last N "
                        "retained checkpoints' generator weights; composes "
                        "with --ema (see sgg.cli.evaluate --avg-last)")
    p.add_argument("--seed", type=int, default=0)
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)

    from sgg.export import export_sampler, load_artifact, save_artifact

    cfg, vocab = load_workdir(args.workdir)
    cfg.model.vocab_size = len(vocab)
    state = create_train_state(cfg, jax.random.key(0))
    mgr = CheckpointManager(args.workdir, cfg)
    if args.avg_last > 1:
        restored = mgr.restore_averaged(state, args.avg_last)
    else:
        restored = mgr.restore(state)
    if restored is None:
        print(f"[sgg.export] no checkpoint in {args.workdir}", file=sys.stderr)
        return 1
    state = restored
    g_params = state.g_params
    if args.ema:
        if state.g_ema is None:
            print(
                "[sgg.export] --ema: checkpoint has no EMA weights "
                "(train with train.ema_decay > 0)",
                file=sys.stderr,
            )
            return 1
        g_params = state.g_ema

    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    enc_params = None
    quant = ""
    if args.with_encoder:
        if cfg.model.encoder == "precomputed" or state.enc_params is None:
            print("[sgg.export] --with-encoder needs an encoder config",
                  file=sys.stderr)
            return 1
        enc_params = state.enc_params
        quant = cfg.model.quant if args.quant is None else (
            "" if args.quant == "none" else args.quant)
    exported, params_flat, meta = export_sampler(
        cfg, vocab, g_params, enc_params=enc_params, quant=quant,
        batch_size=args.batch_size,
        num_samples=args.num_samples, temperature=args.temperature,
        platforms=platforms,
    )
    meta["step"] = int(state.step)
    out = args.out or os.path.join(args.workdir, "model.sgx")
    save_artifact(out, exported, params_flat, meta)
    size_mb = os.path.getsize(out) / 1e6
    print(f"[sgg.export] step {int(state.step)} → {out} "
          f"({size_mb:.1f} MB, platforms={list(platforms)}, "
          f"batch={args.batch_size}, k={args.num_samples})", flush=True)

    if args.check:
        from sgg.eval.sampler import make_sampler

        call, meta2 = load_artifact(out)
        r = np.random.RandomState(args.seed)
        check_b = args.batch_size or 4  # polymorphic exports: any size works
        f32 = lambda t: jax.tree.map(  # noqa: E731
            lambda p: jax.numpy.asarray(p, jax.numpy.float32), t)
        key = jax.random.key(args.seed)
        live = make_sampler(
            cfg, step_mask=vocab.step_mask(), num_samples=args.num_samples,
            tau=args.temperature,
        )
        if meta2["input"] == "images":
            from sgg.models.encoders import make_encoder, normalize_for

            s = cfg.data.image_size
            x = r.randint(0, 256, (check_b, s, s, 3)).astype(np.uint8)
            enc = make_encoder(
                cfg.model.encoder, dtype=cfg.model.dtype,
                image_size=s, moe_experts=cfg.model.moe_experts,
                moe_top_k=cfg.model.moe_top_k, quant=quant,
                vit_dims=cfg.model.vit_dims,
            )
            feats = enc.apply(f32(state.enc_params),
                              normalize_for(cfg.model.encoder, x))
        else:
            x = np.asarray(
                r.randn(check_b, cfg.data.regions, cfg.data.feat_dim),
                np.float32,
            ).astype(cfg.model.dtype)
            feats = x
        got = np.asarray(call(x, np.asarray(jax.random.key_data(key))))
        want = np.asarray(live(f32(g_params), feats, key))
        if not np.array_equal(got, want):
            print("[sgg.export] CHECK FAILED: artifact tokens differ",
                  file=sys.stderr)
            return 1
        assert meta2["vocab_tokens"] == list(vocab.tokens)
        print(f"[sgg.export] check ok: {got.shape} tokens bit-identical",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
