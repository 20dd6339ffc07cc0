"""REAL multi-process distributed training (SURVEY.md §2.2 multi-host row).

Spawns two JAX processes with a localhost coordinator (Gloo), each owning 2
CPU devices → a 4-device global mesh across process boundaries. Both run the
fused DP step on process-sharded data; cross-process collectives must yield
bit-identical replicated losses on every host.
"""

import re
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
    pid = int(sys.argv[1])
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
    for _ in range(3):
        state, metrics = step(state, next(it))
    print(f'RESULT pid={{pid}} d_loss={{float(metrics["d_loss"]):.6f}}', flush=True)
    """
)


@pytest.mark.slow
def test_two_process_dp_training(tmp_path):
    import os
    import socket

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(
        _WORKER.format(repo=os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), port=port)
    )
    env = {**os.environ}
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
    losses = []
    for out, _ in outs:
        m = re.search(r"d_loss=([-\d.]+)", out)
        assert m, out
        losses.append(float(m.group(1)))
    # replicated metrics must agree exactly across hosts
    assert losses[0] == losses[1]
