"""Multi-process preemption/restore (VERDICT r2 weak #6).

The failure-recovery model (SURVEY.md §5) is restart-and-resume: a preempted
run restarts, restores the latest checkpoint, fast-forwards its deterministic
data iterator, and continues. This test exercises that model ACROSS PROCESS
BOUNDARIES: two JAX processes (Gloo coordinator, 2 CPU devices each, one
4-device global mesh) train 3 steps, snapshot the replicated state, and are
killed; a fresh pair of processes restores and trains 2 more steps. Every
host's replicated d_loss must be bit-identical to an uninterrupted 5-step
run — state restore, iterator fast-forward, and cross-process collectives
all have to line up exactly for that to hold.
"""

import os
import re
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    pid = int(sys.argv[1])
    phase = sys.argv[2]          # 'full' | 'part1' | 'part2'
    snap = sys.argv[3]           # snapshot path (.npz)
    jax.distributed.initialize(coordinator_address='127.0.0.1:{port}',
                               num_processes=2, process_id=pid)
    from sgg.config import get_config
    from sgg.data import TripleDataset, make_train_iterator, synthetic_dataset
    from sgg.dist import (MeshSpec, batch_sharding, host_local_to_global,
                          make_mesh, replicated_sharding)
    from sgg.train.state import create_train_state
    from sgg.train.step import make_train_step

    cfg = get_config('smoke')
    d = synthetic_dataset(num_images=64, regions=cfg.data.regions,
                          feat_dim=cfg.data.feat_dim, seed=0)
    cfg.model.vocab_size = len(d['vocab'])
    cfg.train.batch_size, cfg.train.n_critic = 4, 2

    mesh = make_mesh(MeshSpec(data=-1, model=1))
    ds = TripleDataset(features=d['features'], triples=d['triples'])
    it = make_train_iterator(ds, cfg.train.batch_size, cfg.train.n_critic,
                             seed=0, sharding=batch_sharding(mesh), prefetch=0)
    state = host_local_to_global(
        create_train_state(cfg, jax.random.key(0)), replicated_sharding(mesh))
    step = make_train_step(cfg, mesh=mesh, donate=False)

    def snapshot(state, path):
        # Replicated arrays are addressable on every host; host 0 writes.
        leaves, _ = jax.tree.flatten(state)
        if pid == 0:
            np.savez(path, *[np.asarray(
                jax.random.key_data(l) if jax.dtypes.issubdtype(
                    l.dtype, jax.dtypes.prng_key) else l) for l in leaves])

    def restore(state, path):
        z = np.load(path)
        leaves, treedef = jax.tree.flatten(state)
        out = []
        for i, l in enumerate(leaves):
            v = z[f'arr_{{i}}']
            if jax.dtypes.issubdtype(l.dtype, jax.dtypes.prng_key):
                out.append(jax.random.wrap_key_data(v))
            else:
                out.append(v.astype(l.dtype))
        return host_local_to_global(
            jax.tree.unflatten(treedef, out), replicated_sharding(mesh))

    if phase == 'full':
        n0, n1 = 5, 0
    elif phase == 'part1':
        n0, n1 = 3, 0
    else:
        n0, n1 = 0, 2
        state = restore(state, snap)
        for _ in range(3):   # deterministic iterator fast-forward
            next(it)

    for _ in range(max(n0, n1)):
        state, metrics = step(state, next(it))
    if phase == 'part1':
        snapshot(state, snap)
    print(f'RESULT pid={{pid}} step={{int(state.step)}} '
          f'd_loss={{float(metrics["d_loss"]):.9f}}', flush=True)
    """
)


def _run_pair(script, phase, snap):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    src = _WORKER.format(
        repo=os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), port=port)
    script.write_text(src)
    env = {**os.environ}
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), phase, snap],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    results = []
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker ({phase}) failed:\n{err[-2000:]}"
        m = re.search(r"step=(\d+) d_loss=([-\d.]+)", out)
        assert m, out
        results.append((int(m.group(1)), float(m.group(2))))
    return results


@pytest.mark.slow
def test_preempt_restore_matches_uninterrupted(tmp_path):
    snap = str(tmp_path / "snap.npz")
    full = _run_pair(tmp_path / "w_full.py", "full", snap + ".unused")

    _run_pair(tmp_path / "w1.py", "part1", snap)
    assert os.path.exists(snap), "host 0 did not write the snapshot"
    resumed = _run_pair(tmp_path / "w2.py", "part2", snap)

    # Same final step, bit-identical replicated loss on every host.
    assert full[0] == full[1]
    assert resumed[0] == resumed[1]
    assert resumed[0][0] == full[0][0] == 5
    assert resumed[0][1] == full[0][1]
