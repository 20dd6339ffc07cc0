"""``evaluate`` entry point — recall@k of a trained run, no files written.

Reference component #9 (SURVEY.md §2.1) as its own script: sample scene
graphs for the held-out split and report recall@k against ground truth.
A thin wrapper over the generation machinery with evaluation defaults.
Works for precomputed-feature AND end-to-end encoder configs — the latter
encode held-out images through the checkpoint's backbone per batch.

  python -m sgg.cli.evaluate --workdir /runs/vg1k --k 50 --num-samples 100
  python -m sgg.cli.evaluate --workdir /runs/vg1k --k 20,50,100 --per-predicate
"""

from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

from sgg.cli.common import add_platform_arg, apply_platform, load_dataset
from sgg.eval import (
    corpus_mean_recall,
    corpus_recall_multi,
    corpus_zero_shot_recall,
    make_sampler,
)
from sgg.train.checkpoint import CheckpointManager, load_workdir
from sgg.train.state import create_train_state


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True)
    p.add_argument("--k", default="50",
                   help="recall cutoff(s); comma-separated for several "
                        "(e.g. 20,50,100) — one sampling pass covers all")
    p.add_argument("--per-predicate", action="store_true",
                   help="also report predicate-balanced mean recall (mR@k, "
                        "at the largest k) and the worst/best predicates")
    p.add_argument("--num-samples", default="100",
                   help="noise draws per image. Comma-separated values "
                        "sweep the saturation curve IN ONE PROCESS: draws "
                        "are iid, so the first K' of max-K draws are "
                        "distributed exactly as a K' run — one sampling "
                        "pass at max K, host-side prefix truncation per "
                        "K' (same noise across Ks isolates the K effect)")
    p.add_argument("--temperature", default=None,
                   help="sampling temperature(s): tokens ~ softmax(logits/T) "
                        "(default 1.0 = the model's own distribution). "
                        "Comma-separated values sweep IN ONE PROCESS: "
                        "temperature is a traced operand of the sampler, so "
                        "every value reuses the same compiled program and "
                        "feature pass (each separate invocation costs "
                        "20-40 s compile + the feature upload on a relay)")
    p.add_argument("--rank", default="freq",
                   help="triple confidence order(s) the recall@k cut uses — "
                        "comma-separated to sweep (one sampling pass covers "
                        "all): sample frequency (freq — ties first-sampled, "
                        "the historical ordering), frequency with model "
                        "log-prob tiebreak (freq_logp), or pure model "
                        "probability mass (logp) — see sgg.eval.rank_triples")
    p.add_argument("--predicate-adjust", default="0",
                   metavar="ALPHA",
                   help="logit adjustment for the long predicate tail "
                        "(rank=logp only): subtract ALPHA·log p̂(predicate) "
                        "— the train-split prior — from each triple's "
                        "score, trading a little recall@k for mR@k "
                        "(Menon et al. 2020). Comma-separated ALPHAs sweep "
                        "host-side: the adjustment re-ranks already-sampled "
                        "tokens, so extra values cost no device work "
                        "(ALPHA=0 = unadjusted logp)")
    p.add_argument("--top-p", type=float, default=None,
                   help="nucleus sampling: keep the smallest token set with "
                        "cumulative probability >= p per decode step "
                        "(tempered distribution; --decode xla only)")
    p.add_argument("--top-k", type=int, default=0,
                   help="top-k sampling: keep only the k most likely tokens "
                        "per decode step (0 = off; --decode xla only)")
    p.add_argument("--num-images", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--split", default="test", choices=["train", "test"])
    p.add_argument("--decode", default="xla", choices=["xla", "fused"],
                   help="decode path (see sgg.cli.generate --decode)")
    p.add_argument("--ema", action="store_true",
                   help="sample from the EMA generator weights (requires a "
                        "run trained with train.ema_decay > 0)")
    p.add_argument("--avg-last", type=int, default=0, metavar="N",
                   help="tail-average (offline SWA) the generator weights "
                        "over the last N retained checkpoints before "
                        "sampling; composes with --ema (averages the EMA "
                        "trajectory). 0/1 = latest checkpoint as-is")
    p.add_argument("--zero-shot", action="store_true",
                   help="also report zero-shot recall: recall over held-out "
                        "GT triples never seen in the training split")
    p.add_argument("--predcls", action="store_true",
                   help="also report predicate classification (PredCls): "
                        "rank predicates with the decode clamped to each GT "
                        "(subject, object) pair; P-R@k = GT predicate in "
                        "top-k of the conditional distribution")
    p.add_argument("--predcls-samples", type=int, default=16,
                   help="noise draws mixture-averaged per PredCls row")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bootstrap", type=int, default=0, metavar="N",
                   help="also report 95%% percentile-bootstrap confidence "
                        "intervals for each recall@k (N replicates "
                        "resampling IMAGES with replacement — the i.i.d. "
                        "unit of the macro average; milliseconds of host "
                        "work, no extra sampling)")
    p.add_argument("--json-out", default=None, metavar="PATH",
                   help="also write the full (temperature x K x rank x "
                        "alpha) result grid as one JSON file — one record "
                        "per combo with every recall@k / zsR@k / mR@k — "
                        "for machine consumption of sweep runs")
    p.add_argument("--exclude-seen", default="off",
                   choices=["off", "on", "sweep"],
                   help="drop train-seen triples from each image's samples "
                        "BEFORE ranking (host-side, free): a decode-time "
                        "novelty lever for the zero-shot metric — if good "
                        "novel compositions exist below the memorized "
                        "ones, this surfaces them (at plain-R@k cost, "
                        "since most GT is train-seen). 'sweep' evaluates "
                        "both settings from the same samples")
    p.add_argument("--stall-exit-sec", type=int, default=900,
                   help="exit 86 when no sampling batch lands for this "
                        "long (the relay can wedge a dispatch forever; "
                        "supervisors relaunch on 86). 0 disables")
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)

    cfg, vocab = load_workdir(args.workdir)
    cfg.model.vocab_size = len(vocab)
    ds, _ = load_dataset(cfg, split=args.split)
    n_images = min(args.num_images or len(ds), len(ds))

    state = create_train_state(cfg, jax.random.key(0))
    mgr = CheckpointManager(args.workdir, cfg)
    if args.avg_last > 1:
        restored = mgr.restore_averaged(state, args.avg_last)
        if restored is not None:
            n_avg = min(args.avg_last, len(mgr.all_steps()))
            print(f"[sgg.evaluate] --avg-last: generator weights averaged "
                  f"over {n_avg} checkpoints (steps {mgr.all_steps()[-n_avg:]})",
                  flush=True)
    else:
        restored = mgr.restore(state)
    if restored is None:
        print(f"[sgg.evaluate] no checkpoint in {args.workdir}", file=sys.stderr)
        return 1
    state = restored
    g_params = state.g_params
    if args.ema:
        if state.g_ema is None:
            print(
                "[sgg.evaluate] --ema: checkpoint has no EMA weights "
                "(train with train.ema_decay > 0)",
                file=sys.stderr,
            )
            return 1
        g_params = state.g_ema

    temps = (
        [None] if args.temperature in (None, "") else
        [float(x) for x in str(args.temperature).split(",") if x.strip()]
    )
    ranks = [r.strip() for r in str(args.rank).split(",") if r.strip()]
    for r in ranks:
        if r not in ("freq", "freq_logp", "logp"):
            print(f"[sgg.evaluate] unknown --rank {r!r}", file=sys.stderr)
            return 2
    with_logp = any(r != "freq" for r in ranks)
    ex_opts = {"off": [False], "on": [True],
               "sweep": [False, True]}[args.exclude_seen]
    kss = sorted({int(x) for x in
                  str(args.num_samples).split(",") if x.strip()}) or [100]
    n_draws = kss[-1]  # sample once at max K; smaller Ks are prefixes
    if (args.top_k or args.top_p is not None) and args.decode == "fused":
        print(
            "[sgg.evaluate] --top-k/--top-p filter the sampling "
            "distribution, which the fused kernel does not implement; use "
            "--decode xla",
            file=sys.stderr,
        )
        return 2
    if args.decode == "fused":
        if with_logp:
            print(
                "[sgg.evaluate] --rank freq_logp/logp needs per-draw "
                "log-probs, which the fused kernel does not emit; use "
                "--decode xla",
                file=sys.stderr,
            )
            return 2
        if len(temps) > 1:
            print(
                "[sgg.evaluate] the fused kernel samples at temperature "
                "1.0 only; use --decode xla for a temperature sweep",
                file=sys.stderr,
            )
            return 2
        from sgg.eval.sampler import make_fused_sampler

        sampler = make_fused_sampler(
            cfg, step_mask=vocab.step_mask(), num_samples=n_draws,
            tau=temps[0],
        )
    else:
        sampler = make_sampler(
            cfg, step_mask=vocab.step_mask(), num_samples=n_draws,
            tau=temps[0], with_logp=with_logp,
            top_k=args.top_k or 0, top_p=args.top_p,
        )
    # End-to-end configs: encode features per batch through the
    # checkpoint's backbone (shared path with sgg.cli.generate).
    from sgg.cli.common import make_batch_features

    batch_features = make_batch_features(cfg, ds, state.enc_params)

    rng = jax.random.key(args.seed)
    from sgg.eval import rank_triples

    alphas = [float(x) for x in
              str(args.predicate_adjust).split(",") if x.strip()] or [0.0]
    log_prior = None
    if any(a != 0 for a in alphas):
        if "logp" not in ranks:
            print(
                "[sgg.evaluate] --predicate-adjust applies to --rank logp "
                "only",
                file=sys.stderr,
            )
            return 2
        train_ds, _ = load_dataset(cfg, split="train")
        counts = np.zeros(len(vocab), np.float64)
        for trips in train_ds.triples:
            for t in trips:
                counts[int(t[1])] += 1.0
        prior = (counts + 1.0) / (counts.sum() + len(vocab))  # smoothed
        log_prior = np.log(prior)

    # Rank-side combos: the α sweep applies to rank=logp only, and both it
    # and the exclude-seen filter are pure host-side re-rankings of the
    # same tokens — extra combos cost no device work. (α=0 ≡ unadjusted.)
    rcombos = [(r, a, e) for r in ranks
               for a in (alphas if r == "logp" else [0.0])
               for e in ex_opts]
    adj_map = {
        (r, a): (a * log_prior if (r == "logp" and a != 0) else None)
        for r, a, _ in rcombos
    }

    seen = None
    if args.zero_shot or any(e for _, _, e in rcombos):
        train_ds, _ = load_dataset(cfg, split="train")
        seen = {
            tuple(int(x) for x in t)
            for trips in train_ds.triples for t in trips
        }

    # One sampling pass per temperature per batch (all on ONE compiled
    # program — temp is traced); every rank ordering reuses its
    # temperature's tokens host-side.
    gen = {(ti, ks, r, a, e): []
           for ti in range(len(temps)) for ks in kss
           for (r, a, e) in rcombos}
    gt_triples = []
    B = args.batch_size

    # Stall watchdog: the relay can wedge a single dispatch forever (0 CPU,
    # no error) and this loop is the CLI's long device-bound phase; a
    # daemon thread is the only observer that survives the stuck C++ call.
    import time as _time

    progress = {"t": _time.time()}
    if args.stall_exit_sec > 0:
        import threading

        def _stall_watchdog():
            import os

            while True:
                _time.sleep(30)
                dt = _time.time() - progress["t"]
                if dt > args.stall_exit_sec:
                    print(
                        f"[sgg.evaluate] STALL: no batch readback for "
                        f"{dt:.0f}s (relay hang?) — exit 86 for relaunch",
                        flush=True,
                    )
                    os._exit(86)

        threading.Thread(target=_stall_watchdog, daemon=True).start()

    for lo in range(0, n_images, B):
        idx = np.arange(lo, min(lo + B, n_images))
        feats = batch_features(idx)
        if feats.shape[0] < B:
            feats = np.concatenate(
                [feats, np.repeat(feats[-1:], B - feats.shape[0], axis=0)]
            )
        for ti, T in enumerate(temps):
            rng, sub = jax.random.split(rng)
            if args.decode == "fused":
                out = sampler(g_params, feats, sub)
            else:
                out = sampler(g_params, feats, sub, T)
            if with_logp:
                tokens, logp = (np.asarray(x) for x in out)
            else:
                tokens, logp = np.asarray(out), None
            for j, i in enumerate(idx):
                for ks in kss:
                    lp_j = None if logp is None else logp[j, :ks]
                    novel_mask = None
                    for r, a, e in rcombos:
                        tk, lp2 = tokens[j, :ks], lp_j
                        if e:
                            if novel_mask is None or len(novel_mask) != ks:
                                novel_mask = np.fromiter(
                                    (tuple(map(int, t)) not in seen
                                     for t in tk), bool, ks)
                            tk = tk[novel_mask]
                            lp2 = None if lp2 is None else lp2[novel_mask]
                        gen[(ti, ks, r, a, e)].append(rank_triples(
                            tk, lp2,
                            rank=r, pred_adjust=adj_map[(r, a)],
                        ))
        for i in idx:
            gt_triples.append([tuple(map(int, t)) for t in ds.triples[i]])
        progress["t"] = _time.time()

    ks = sorted({int(k) for k in str(args.k).split(",") if k.strip()})
    combos = [(ti, ksamp, r, a, e) for ti in range(len(temps))
              for ksamp in kss for (r, a, e) in rcombos]
    multi = len(combos) > 1

    def combo_tag(ti, ksamp, r, a, e):
        if not multi:
            return ""
        tag = f" T={1.0 if temps[ti] is None else temps[ti]:g} rank={r}"
        if len(kss) > 1:
            tag += f" K={ksamp}"
        tag += f" adj={a:g}" if a else ""
        return tag + (" novel-only" if e else "")

    records = {}
    for ti, ksamp, r, a, e in combos:
        gen_triples = gen[(ti, ksamp, r, a, e)]
        tag = combo_tag(ti, ksamp, r, a, e)
        recalls = corpus_recall_multi(gen_triples, gt_triples, ks)
        rec = {
            "temperature": 1.0 if temps[ti] is None else temps[ti],
            "num_samples": ksamp, "rank": r, "predicate_adjust": a,
            "exclude_seen": bool(e),
            "recall": {str(k): recalls[k] for k in ks},
        }
        records[(ti, ksamp, r, a, e)] = rec
        rep = " ".join(f"recall@{k} = {recalls[k]:.4f}" for k in ks)
        print(
            f"[sgg.evaluate]{tag} split={args.split} images={n_images} "
            f"samples/image={ksamp} {rep}",
            flush=True,
        )
        if args.bootstrap > 0:
            from sgg.eval import corpus_recall_bootstrap

            cis = corpus_recall_bootstrap(
                gen_triples, gt_triples, ks,
                n_boot=args.bootstrap, seed=args.seed,
            )
            rec["recall_ci95"] = {
                str(k): [cis[k][1], cis[k][2]] for k in ks
            }
            rep = " ".join(
                f"recall@{k} ∈ [{cis[k][1]:.4f}, {cis[k][2]:.4f}]"
                for k in ks
            )
            print(
                f"[sgg.evaluate]{tag} bootstrap 95% CI "
                f"({args.bootstrap} replicates over images): {rep}",
                flush=True,
            )
        if seen is not None and args.zero_shot:
            zs, n_zs = corpus_zero_shot_recall(gen_triples, gt_triples,
                                               seen, ks)
            rec["zero_shot_recall"] = {str(k): zs[k] for k in ks}
            rec["zero_shot_images"] = n_zs
            rep = " ".join(f"zsR@{k} = {zs[k]:.4f}" for k in ks)
            print(
                f"[sgg.evaluate]{tag} zero-shot ({n_zs}/{n_images} images "
                f"with GT triples unseen in {len(seen)} train triples): "
                f"{rep}",
                flush=True,
            )
    def write_json(partial: bool) -> None:
        # Incremental: written once as soon as the main recall/CI/zsR
        # metrics exist, rewritten (final) after the cheap host-side
        # per-predicate mR pass. The expensive PredCls device phase runs
        # LAST and is print-only — a round-end SIGTERM used to lose the
        # WHOLE json including mR because one write happened after
        # everything (round 4 lost the balanced arm's mR/EMA numbers
        # exactly this way — BASELINE.md).
        if not args.json_out:
            return
        import json

        with open(args.json_out, "w") as f:
            json.dump({
                "workdir": args.workdir, "split": args.split,
                "images": int(n_images), "seed": args.seed,
                "ema": bool(args.ema), "decode": args.decode,
                "avg_last": int(args.avg_last),
                "partial": partial,
                "combos": list(records.values()),
            }, f, indent=2)
        print(f"[sgg.evaluate] wrote {args.json_out} "
              f"({len(records)} combos{', partial' if partial else ''})",
              flush=True)

    write_json(partial=bool(args.per_predicate))
    if args.per_predicate:
        kmax = max(ks)
        for ti, ksamp, r, a, e in combos:
            ctag = combo_tag(ti, ksamp, r, a, e)
            mr, table = corpus_mean_recall(gen[(ti, ksamp, r, a, e)],
                                           gt_triples, k=kmax)
            records[(ti, ksamp, r, a, e)][f"mean_recall@{kmax}"] = mr
            print(f"[sgg.evaluate]{ctag} mR@{kmax} = {mr:.4f} "
                  f"over {len(table)} predicates with support", flush=True)
            if multi:
                continue  # worst/best tables only for single-combo runs
            by_r = sorted(table.items(), key=lambda kv: kv[1][0])
            for tag, rows in (("worst", by_r[:5]), ("best", by_r[-5:])):
                for p, (rr, n) in rows:
                    print(f"[sgg.evaluate]   {tag}: {vocab.token(p):<24} "
                          f"recall@{kmax} = {rr:.4f}  (n={n})", flush=True)
        write_json(partial=False)
    if args.predcls:
        from sgg.eval import make_predcls_scorer, predicate_recall

        scorer = make_predcls_scorer(
            cfg, step_mask=vocab.step_mask(),
            num_samples=args.predcls_samples, tau=temps[0],
        )
        img_rows, s_rows, p_rows, o_rows = [], [], [], []
        for i in range(n_images):
            for (s, pr, o) in gt_triples[i]:
                img_rows.append(i)
                s_rows.append(s)
                p_rows.append(pr)
                o_rows.append(o)
        img_rows = np.asarray(img_rows, np.int32)
        s_rows = np.asarray(s_rows, np.int32)
        p_rows = np.asarray(p_rows, np.int32)
        o_rows = np.asarray(o_rows, np.int32)
        n_rows = len(img_rows)
        scores = np.zeros((n_rows, len(vocab)), np.float32)
        for lo in range(0, n_rows, B):
            hi = min(lo + B, n_rows)
            sel = slice(lo, hi)
            feats = batch_features(img_rows[sel])
            subj, obj = s_rows[sel], o_rows[sel]
            if hi - lo < B:  # pad to the compiled batch shape
                pad = B - (hi - lo)
                feats = np.concatenate([feats, np.repeat(feats[-1:], pad, 0)])
                subj = np.concatenate([subj, np.repeat(subj[-1:], pad)])
                obj = np.concatenate([obj, np.repeat(obj[-1:], pad)])
            rng, sub = jax.random.split(rng)
            scores[sel] = np.asarray(scorer(g_params, feats, subj, obj, sub))[
                : hi - lo
            ]
        pr = predicate_recall(scores, p_rows, ks)
        rep = " ".join(f"P-R@{k} = {pr[k]:.4f}" for k in ks)
        print(
            f"[sgg.evaluate] predcls ({n_rows} GT triples, "
            f"{args.predcls_samples} draws/row): {rep}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
