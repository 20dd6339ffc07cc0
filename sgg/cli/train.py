"""``train`` entry point — adversarial training with the fused WGAN-GP step.

Reference equivalent: ``main.py`` (SURVEY.md §2.1 #7, §3.2). Differences by
design (§3.4): the whole GAN iteration is ONE compiled dispatch; data arrives
through a prefetching host-sharded iterator; checkpoints are orbax with
auto-resume; metrics go through clu writers with first-class throughput.

  python -m sgg.cli.train --config vg1k --workdir /tmp/run \
      --set train.total_steps=2000
"""

from __future__ import annotations

import argparse
import sys

import jax

from sgg.cli.common import (
    add_config_args,
    apply_platform,
    load_dataset,
    resolve_config,
)
from sgg.data import make_train_iterator
from sgg.dist import (
    batch_sharding,
    initialize_multihost,
    mesh_from_config,
    replicated_sharding,
)
from sgg.train.checkpoint import CheckpointManager
from sgg.train.metrics import MetricLogger
from sgg.dist import place_state
from sgg.train.state import create_train_state, param_count
from sgg.train.step import make_train_step, make_train_step_gspmd


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    add_config_args(p)
    p.add_argument("--steps", type=int, default=None, help="override total_steps")
    p.add_argument("--encoder-ckpt", default=None,
                   help="initialize the backbone from a sgg.cli.pretrain "
                        "output (dir with encoder_params.npz, or the .npz "
                        "itself) instead of random init — end-to-end encoder "
                        "configs only; pairs with train.train_encoder for "
                        "GAN fine-tuning from pixels")
    p.add_argument("--profile", action="store_true",
                   help="capture an XProf trace of steps 10..15 into workdir/profile")
    p.add_argument("--debug-nans", action="store_true",
                   help="fail fast on NaNs inside the compiled step")
    args = p.parse_args(argv)

    apply_platform(args)
    if args.debug_nans:
        from sgg.utils.debug import enable_nan_checks

        enable_nan_checks()
    initialize_multihost()
    cfg = resolve_config(args)
    if args.steps is not None:
        cfg.train.total_steps = args.steps

    ds, vocab = load_dataset(cfg)
    cfg.model.vocab_size = len(vocab)
    print(
        f"[sgg.train] config={cfg.name} images={len(ds)} vocab={len(vocab)} "
        f"devices={jax.device_count()} processes={jax.process_count()}",
        flush=True,
    )

    # Mesh: shard over 'data' whenever >1 device is visible.
    mesh = None
    sharding = None
    if jax.device_count() > 1:
        mesh = mesh_from_config(cfg.mesh)
        sharding = batch_sharding(mesh)
        print(f"[sgg.train] mesh={dict(mesh.shape)}", flush=True)

    ckpt = CheckpointManager(
        cfg.workdir, cfg, max_to_keep=cfg.train.max_checkpoints
    )
    ckpt.save_vocab(vocab)

    enc_params = None
    if args.encoder_ckpt:
        import os

        if cfg.model.encoder == "precomputed":
            print("[sgg.train] --encoder-ckpt requires an end-to-end "
                  "encoder config (model.encoder != 'precomputed')",
                  file=sys.stderr)
            return 1
        from sgg.train.pretrain import load_params_npz

        path = args.encoder_ckpt
        if os.path.isdir(path):
            path = os.path.join(path, "encoder_params.npz")
        enc_params = {"params": load_params_npz(path)}
        print(f"[sgg.train] encoder weights ← {path}", flush=True)

    state = create_train_state(
        cfg, jax.random.key(cfg.train.seed), enc_params=enc_params
    )
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        print(f"[sgg.train] resumed from step {int(state.step)}", flush=True)
    print(
        f"[sgg.train] params: G={param_count(state.g_params):,} "
        f"D={param_count(state.d_params):,}",
        flush=True,
    )

    use_gspmd = mesh is not None and (
        cfg.mesh.partition == "gspmd"
        or (cfg.mesh.partition == "auto" and (cfg.mesh.model > 1 or cfg.mesh.fsdp))
    )
    if use_gspmd:
        step_fn, state_sh = make_train_step_gspmd(
            cfg, mesh, step_mask=vocab.step_mask(),
            tp=cfg.mesh.model > 1, fsdp=cfg.mesh.fsdp,
        )
        state = place_state(state, state_sh)
        print(
            f"[sgg.train] gspmd partition: tp={cfg.mesh.model > 1} "
            f"fsdp={cfg.mesh.fsdp}",
            flush=True,
        )
    else:
        if mesh is not None:
            # Restored/created arrays are committed to one device; replicate
            # them over the mesh so they compose with sharded batches
            # (multi-host-safe placement).
            from sgg.dist import host_local_to_global

            state = host_local_to_global(state, replicated_sharding(mesh))
        step_fn = make_train_step(cfg, step_mask=vocab.step_mask(), mesh=mesh)

    # Data: device-resident gather pipeline when the features fit HBM
    # (zero per-step host traffic); host prefetch iterator otherwise.
    from sgg.data import TripleDataset, make_device_train_iterator
    from sgg.data.images import ArrayImageTripleDataset, ImageTripleDataset

    if cfg.data.predicate_balance > 0 and hasattr(ds, "set_predicate_balance"):
        # Long-tail resampling: every loader below reads the weights off the
        # dataset (host/grain via sample_batch, device iterators via the
        # in-jit inverse-CDF path).
        ds.set_predicate_balance(cfg.data.predicate_balance)
        print(
            f"[sgg.train] predicate-balanced triple sampling "
            f"(alpha={cfg.data.predicate_balance})",
            flush=True,
        )

    # Path-backed image datasets: decode ONCE into an in-memory uint8 array
    # when the corpus fits the HBM budget — turns end-to-end encoder
    # training (incl. train.train_encoder fine-tuning) from per-step image
    # uploads (~1.4 s/step through this relay at batch 64) into the same
    # zero-host-traffic device-resident gather the precomputed tiers use.
    if (
        cfg.data.device_resident
        and cfg.data.loader != "grain"
        and jax.process_count() == 1
        and isinstance(ds, ImageTripleDataset)
        and ds.est_bytes <= cfg.data.device_resident_max_bytes
    ):
        print(
            f"[sgg.train] materializing {len(ds)} images "
            f"({ds.est_bytes / 1e9:.1f} GB uint8) for device residency",
            flush=True,
        )
        ds = ds.materialize(log=lambda m: print(m, flush=True))

    # Device-resident data commits process-local arrays, which cannot satisfy
    # a non-addressable global sharding — multi-host runs must take the
    # host-prefetch path (it builds global arrays via
    # make_array_from_process_local_data).
    _store = getattr(ds, "features", None)
    _int8_store = bool(cfg.data.feature_store_int8) and _store is not None
    if _store is None:
        _store = getattr(ds, "images", None) if isinstance(
            ds, ArrayImageTripleDataset) else None

    def _store_bytes(a):
        # Bytes the store occupies in HBM / per relay upload. int8 mode
        # quantizes feature stores to int8 + a per-region f32 scale.
        if not _int8_store:
            return a.nbytes
        return a.nbytes // a.dtype.itemsize + a[..., 0].size * 4

    use_device_data = (
        cfg.data.loader != "grain"
        and cfg.data.device_resident
        and jax.process_count() == 1
        and _store is not None
        and _store_bytes(_store) <= cfg.data.device_resident_max_bytes
    )
    grain_it = None
    if cfg.data.loader == "grain":
        # Grain loader: deterministic global shuffle + checkpointable
        # iterator — its state rides along with every orbax save so resume
        # continues the exact mid-epoch sample sequence.
        from sgg.data.grain_pipeline import make_grain_iterator

        it = grain_it = make_grain_iterator(
            ds, cfg.train.batch_size, cfg.train.n_critic,
            seed=cfg.train.seed, sharding=sharding,
            num_workers=cfg.data.grain_workers,
        )
        data_state = ckpt.restore_data_state()
        if restored is not None and data_state is not None:
            grain_it.set_state(data_state)
            print("[sgg.train] grain iterator state restored "
                  "(exact mid-epoch resume)", flush=True)
        else:
            print(f"[sgg.train] grain loader "
                  f"(workers={cfg.data.grain_workers})", flush=True)
    elif use_device_data:
        it = make_device_train_iterator(
            ds, cfg.train.batch_size, cfg.train.n_critic,
            seed=cfg.train.seed, sharding=sharding,
            int8_store=_int8_store,
        )
        print("[sgg.train] device-resident dataset "
              f"({_store_bytes(_store) / 1e6:.0f} MB in HBM"
              f"{', int8+scale' if _int8_store else ''})", flush=True)
    elif (
        cfg.data.device_resident
        and cfg.data.rotate_subsets
        and jax.process_count() == 1
        and isinstance(ds, (TripleDataset, ArrayImageTripleDataset))
    ):
        # Bigger than the HBM budget: rotate device-resident subsets —
        # train on one while the next uploads in the background.
        from sgg.data.pipeline import make_rotating_device_iterator

        subset_bytes = cfg.data.device_resident_max_bytes // 2
        it = make_rotating_device_iterator(
            ds, cfg.train.batch_size, cfg.train.n_critic,
            seed=cfg.train.seed, subset_bytes=subset_bytes,
            min_steps_per_subset=cfg.data.rotation_min_steps,
            sharding=sharding,
            int8_store=_int8_store,
            log=lambda m: print(m, flush=True),
        )
        _rot_store = getattr(ds, "features", None)
        if _rot_store is None:
            _rot_store = ds.images
        _rot_bytes = _store_bytes(_rot_store)
        n_subsets = -(-_rot_bytes // subset_bytes)
        print(
            f"[sgg.train] rotating device-resident subsets "
            f"({_rot_bytes / 1e9:.1f} GB over {n_subsets} subsets "
            f"of ≤{subset_bytes / 1e9:.1f} GB"
            f"{', int8+scale' if _int8_store else ''})",
            flush=True,
        )
    else:
        it = make_train_iterator(
            ds, cfg.train.batch_size, cfg.train.n_critic,
            seed=cfg.train.seed, sharding=sharding,
        )
    logger = MetricLogger(cfg.workdir)
    # images consumed per fused step across all processes
    images_per_step = (
        cfg.train.batch_size * (cfg.train.n_critic + 1) * jax.process_count()
    )

    probe = None
    if cfg.train.eval_every > 0:
        if jax.process_count() > 1:
            print(
                "[sgg.train] train.eval_every: in-loop probe is "
                "single-process only — skipping (evaluate offline)",
                flush=True,
            )
        else:
            from sgg.train.eval_probe import EvalProbe

            probe = EvalProbe(cfg, vocab, log=lambda m: print(m, flush=True))
            print(
                f"[sgg.train] eval probe every {cfg.train.eval_every} steps "
                f"({probe.n_images} held-out images, "
                f"recall@{probe.k})",
                flush=True,
            )

    profiler = None
    if args.profile:
        import os

        from sgg.utils.profiling import StepProfiler

        profiler = StepProfiler(
            os.path.join(cfg.workdir, "profile"), start_step=int(state.step) + 10
        )

    # Fused multi-step dispatch (train.steps_per_dispatch > 1): N sample+step
    # iterations inside ONE jitted program. On dispatch-latency-bound
    # attachments (this machine's relay: ~30 ms/dispatch × 2-3 dispatches
    # per step ≈ 80-100 ms/step of pure latency) this is THE wall-throughput
    # lever — the per-step loop measured ~10-13 steps/s wall vs 113 steps/s
    # in-compute (BASELINE.md round 5). Sample and step rng both key off the
    # global step, so stride is a pure scheduling choice.
    stride = max(1, int(cfg.train.steps_per_dispatch))
    if stride > 1:
        import math

        if not (use_device_data and jax.process_count() == 1
                and grain_it is None):
            print("[sgg.train] steps_per_dispatch needs the single-process "
                  "device-resident data path — falling back to per-step "
                  "dispatch", flush=True)
            stride = 1
        else:
            for v in (cfg.train.log_every, cfg.train.checkpoint_every,
                      cfg.train.eval_every or stride,
                      cfg.train.total_steps, int(state.step) or stride):
                stride = math.gcd(stride, v)
            if stride != cfg.train.steps_per_dispatch:
                print(f"[sgg.train] steps_per_dispatch rounded to {stride} "
                      "(gcd of log/checkpoint/eval cadences + resume step)",
                      flush=True)
    if stride > 1:
        from sgg.data.pipeline import make_fused_device_stepper

        fused_fn, _fused_store = make_fused_device_stepper(
            ds, step_fn, cfg.train.batch_size, cfg.train.n_critic,
            n_steps=stride, seed=cfg.train.seed, sharding=sharding,
            int8_store=_int8_store,
        )

        def step_fn(state, step0, _f=fused_fn, _a=_fused_store):  # noqa: F811
            return _f(state, *_a, step0)

        # Sample-step counters, RELATIVE to this launch (the per-step
        # iterator also restarts its sample stream at 0 on relaunch).
        it = iter(range(0, cfg.train.total_steps, stride))
        print(f"[sgg.train] fused dispatch: {stride} steps/program",
              flush=True)

    from sgg.utils.debug import assert_super_batch

    first_batch = next(it)
    if stride == 1:
        assert_super_batch(first_batch, cfg.train.n_critic, cfg.train.batch_size)

    # Preemption/failure hook (SURVEY.md §5): SIGTERM/SIGINT checkpoint the
    # current state before exiting, so auto-resume loses at most one step.
    import signal

    preempted = {"flag": False}
    prev_handlers = {}

    def _on_term(signum, frame):
        preempted["flag"] = True

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_term)
        except ValueError:
            pass  # non-main thread (tests)

    def _restore_handlers():
        # In-process callers (tests, notebooks) must get their handlers back;
        # leaving ours installed would swallow Ctrl-C for the whole process.
        for sig, h in prev_handlers.items():
            try:
                signal.signal(sig, h)
            except ValueError:
                pass

    # Stall watchdog (config.py stall_exit_sec): a daemon thread exits 86
    # when no log-boundary readback lands for the window — the loop thread
    # itself is stuck inside the wedged dispatch, so only another thread
    # can observe the stall. Supervisors treat 86 like 75 (relaunch +
    # auto-resume; at most checkpoint_every steps are lost).
    import time as _time

    progress = {"t": _time.time()}
    if cfg.train.stall_exit_sec > 0:
        import threading

        def _stall_watchdog():
            import os

            while True:
                _time.sleep(30)
                dt = _time.time() - progress["t"]
                if dt > cfg.train.stall_exit_sec:
                    print(
                        f"[sgg.train] STALL: no log readback for {dt:.0f}s "
                        "(relay hang?) — exit 86 for supervised relaunch",
                        flush=True,
                    )
                    os._exit(86)

        threading.Thread(target=_stall_watchdog, daemon=True).start()

    # The loop tracks the step count on the HOST: reading ``state.step`` back
    # every iteration would force a device sync per step (≥30 ms through this
    # machine's TPU relay — it dominated wall-clock before this change).
    # Device work stays fully async; we synchronize only at log/checkpoint
    # boundaries, where metrics are materialized anyway.
    start = int(state.step)
    try:
        for i in range(start, cfg.train.total_steps, stride):
            if preempted["flag"]:
                print(
                    f"[sgg.train] preemption signal — checkpointing at step {i} "
                    "and exiting",
                    flush=True,
                )
                ckpt.save(
                    state,
                    data_state=grain_it.get_state() if grain_it else None,
                )
                ckpt.close()
                return 0
            batch = first_batch if i == start else next(it)
            if profiler:
                profiler.maybe_start(i)
            state, metrics = step_fn(state, batch)
            step = i + stride
            if profiler and profiler.maybe_stop(step):
                print(f"[sgg.train] profile trace → {profiler.logdir}", flush=True)
            if step % cfg.train.log_every == 0 or step == cfg.train.total_steps:
                scalars = logger.log(step, metrics, images_per_step=images_per_step)
                msg = " ".join(
                    f"{k}={scalars[k]:.4f}"
                    for k in ("d_loss", "g_loss", "w_dist", "gp")
                    if k in scalars
                )
                ips = scalars.get("images_per_sec_per_chip")
                ips_s = f" img/s/chip={ips:.1f}" if ips else ""
                print(f"[sgg.train] step {step}: {msg}{ips_s}", flush=True)
                progress["t"] = _time.time()
            if probe and (
                step % cfg.train.eval_every == 0
                or step == cfg.train.total_steps
            ):
                logger.log(step, probe.run(state, step))
                progress["t"] = _time.time()
            at_ckpt = (
                step % cfg.train.checkpoint_every == 0
                or step == cfg.train.total_steps
            )
            if at_ckpt:
                ckpt.save(
                    state,
                    data_state=grain_it.get_state() if grain_it else None,
                )
                progress["t"] = _time.time()
            # Host-RSS watchdog (config.py host_rss_exit_gb): hand over to
            # the supervisor BEFORE the host OOM killer SIGKILLs us (which
            # loses up to checkpoint_every steps and can wedge the relay
            # terminal). Checked at EVERY log boundary, not just checkpoint
            # boundaries: a wedged relay op leaked host RSS at line rate
            # (~33 MB/s ≈ 34 GB in 17 min) between two checkpoints once,
            # sailing straight past the limit while the coarse check slept.
            limit = cfg.train.host_rss_exit_gb
            if (
                limit > 0
                and step < cfg.train.total_steps
                and (at_ckpt or step % cfg.train.log_every == 0)
            ):
                from sgg.utils.debug import host_rss_gb

                rss = host_rss_gb()
                if rss > limit:
                    if not at_ckpt:
                        ckpt.save(
                            state,
                            data_state=grain_it.get_state() if grain_it else None,
                        )
                    print(
                        f"[sgg.train] host RSS {rss:.1f} GB > "
                        f"{limit:.0f} GB limit — checkpointed at step "
                        f"{step}, exiting 75 for supervised relaunch",
                        flush=True,
                    )
                    ckpt.close()
                    return 75
    finally:
        _restore_handlers()
    ckpt.close()
    logger.close()
    print(f"[sgg.train] done at step {int(state.step)} → {cfg.workdir}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
