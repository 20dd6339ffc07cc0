"""End-to-end smoke of the three public entry points (SURVEY.md §4):
preprocess → train → generate on synthetic data, including auto-resume.
"""

import json
import os

import pytest

from sgg.cli import generate as cli_generate
from sgg.cli import preprocess as cli_preprocess
from sgg.cli import train as cli_train


@pytest.fixture(scope="module")
def pipedir(tmp_path_factory):
    return tmp_path_factory.mktemp("pipe")


def _train_args(pipedir, steps):
    return [
        "--config", "smoke",
        "--workdir", str(pipedir / "run"),
        "--set", "data.source=shards",
        "--set", f"data.data_dir={pipedir / 'data'}",
        "--set", "data.regions=9",
        "--set", "data.feat_dim=16",
        "--set", "train.checkpoint_every=5",
        "--steps", str(steps),
    ]


def test_preprocess_synthetic(pipedir):
    rc = cli_preprocess.main(
        ["--out-dir", str(pipedir / "data"), "--synthetic", "64",
         "--regions", "9", "--feat-dim", "16"]
    )
    assert rc == 0
    assert (pipedir / "data" / "vocab.json").exists()
    assert (pipedir / "data" / "shard-00000-of-00001.npz").exists()
    assert (pipedir / "data" / "test").is_dir()


def test_train_and_resume(pipedir):
    assert cli_train.main(_train_args(pipedir, 5)) == 0
    assert (pipedir / "run" / "config.json").exists()
    assert (pipedir / "run" / "vocab.json").exists()
    # resume continues rather than restarting
    assert cli_train.main(_train_args(pipedir, 8)) == 0


def test_generate_scene_graphs(pipedir):
    out = str(pipedir / "graphs.json")
    rc = cli_generate.main(
        ["--workdir", str(pipedir / "run"), "--out", out,
         "--num-samples", "8", "--num-images", "6", "--batch-size", "4",
         "--recall-k", "10"]
    )
    assert rc == 0
    d = json.load(open(out))
    assert d["num_images"] == 6
    assert len(d["scene_graphs"]) == 6
    g = d["scene_graphs"][0]["triples"]
    assert g and {"subject", "predicate", "object", "count"} <= set(g[0])
    # aggregate sample counts equal the draw count
    assert sum(t["count"] for t in g) == 8


def test_train_and_generate_end_to_end_encoder(tmp_path):
    """Encoder config: generate runs the frozen backbone on images."""
    wd = str(tmp_path / "img_run")
    args = [
        "--config", "smoke", "--workdir", wd,
        "--set", "model.encoder=vgg19",
        "--set", "data.image_size=16",  # 1x1 conv5 grid: cheap CPU compile
        "--set", "data.regions=1",
        "--set", "data.feat_dim=512",
        "--set", "data.num_synthetic_images=16",
        "--set", "train.batch_size=2",
        "--set", "train.n_critic=1",
        "--set", "train.checkpoint_every=2",
        # partitioning the full VGG step over 8 fake devices is too slow to
        # compile on CI CPUs — use a 1-device sub-mesh
        "--set", "mesh.data=1", "--set", "mesh.model=1",
        "--steps", "2",
    ]
    assert cli_train.main(args) == 0
    out = str(tmp_path / "img_graphs.json")
    rc = cli_generate.main(
        ["--workdir", wd, "--out", out, "--num-samples", "4",
         "--num-images", "4", "--batch-size", "2"]
    )
    assert rc == 0
    d = json.load(open(out))
    assert len(d["scene_graphs"]) == 4
    # evaluate also supports end-to-end configs (encodes per batch through
    # the checkpoint's backbone) — multi-k line must print and return 0
    from sgg.cli import evaluate as cli_evaluate

    rc = cli_evaluate.main(
        ["--workdir", wd, "--split", "test", "--k", "5,10",
         "--num-samples", "4", "--num-images", "4", "--batch-size", "2"]
    )
    assert rc == 0


def test_generate_without_checkpoint_fails_cleanly(pipedir, tmp_path):
    wd = tmp_path / "empty_run"
    os.makedirs(wd / "checkpoints", exist_ok=True)
    (wd / "config.json").write_text((pipedir / "run" / "config.json").read_text())
    (wd / "vocab.json").write_text((pipedir / "run" / "vocab.json").read_text())
    rc = cli_generate.main(["--workdir", str(wd)])
    assert rc == 1


def test_train_grain_loader_exact_resume(pipedir, capsys):
    """data.loader=grain trains, checkpoints the iterator snapshot, and a
    resumed run restores it (exact mid-epoch continuation; VERDICT r2 #4)."""
    args = lambda steps: [
        "--config", "smoke",
        "--workdir", str(pipedir / "grainrun"),
        "--set", "data.source=shards",
        "--set", f"data.data_dir={pipedir / 'data'}",
        "--set", "data.regions=9",
        "--set", "data.feat_dim=16",
        "--set", "data.loader=grain",
        "--set", "train.checkpoint_every=5",
        "--steps", str(steps),
    ]
    assert cli_train.main(args(5)) == 0
    ckdir = pipedir / "grainrun" / "checkpoints"
    assert (ckdir / "data_iter_5.bin").exists()
    capsys.readouterr()
    assert cli_train.main(args(8)) == 0
    out = capsys.readouterr().out
    assert "grain iterator state restored" in out
    assert (ckdir / "data_iter_8.bin").exists()


def test_train_ema_and_evaluate_zero_shot(tmp_path, capsys):
    """EMA weights train + restore + sample via --ema; --zero-shot reports
    recall over held-out GT triples unseen in the training split."""
    from sgg.cli import evaluate as cli_evaluate

    data = tmp_path / "data"
    assert cli_preprocess.main(
        ["--out-dir", str(data), "--synthetic", "64",
         "--regions", "9", "--feat-dim", "16"]
    ) == 0
    wd = tmp_path / "run_ema"

    def train_args(workdir, *, ema):
        a = [
            "--config", "smoke",
            "--workdir", str(workdir),
            "--set", "data.source=shards",
            "--set", f"data.data_dir={data}",
            "--set", "data.regions=9",
            "--set", "data.feat_dim=16",
            "--set", "train.checkpoint_every=5",
        ]
        if ema:
            a += ["--set", "train.ema_decay=0.9"]
        return a + ["--steps", "5"]

    assert cli_train.main(train_args(wd, ema=True)) == 0
    rc = cli_evaluate.main(
        ["--workdir", str(wd), "--k", "10", "--num-samples", "4",
         "--num-images", "6", "--batch-size", "4", "--ema", "--zero-shot"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "zsR@10" in out and "zero-shot" in out

    # log-prob rankings run end to end through the CLI (with_logp sampler)
    for rank in ("freq_logp", "logp"):
        rc = cli_evaluate.main(
            ["--workdir", str(wd), "--k", "10", "--num-samples", "4",
             "--num-images", "6", "--batch-size", "4", "--rank", rank]
        )
        assert rc == 0
        assert "recall@10" in capsys.readouterr().out
    # logit-adjusted tail ranking composes with rank=logp (and only logp)
    rc = cli_evaluate.main(
        ["--workdir", str(wd), "--k", "10", "--num-samples", "4",
         "--num-images", "6", "--batch-size", "4", "--rank", "logp",
         "--predicate-adjust", "0.5"]
    )
    assert rc == 0
    assert "recall@10" in capsys.readouterr().out
    rc = cli_evaluate.main(
        ["--workdir", str(wd), "--k", "10", "--num-samples", "4",
         "--num-images", "6", "--batch-size", "4", "--predicate-adjust",
         "0.5"]
    )
    assert rc == 2

    # ranking by log-prob needs per-draw log-probs the fused kernel lacks
    rc = cli_evaluate.main(
        ["--workdir", str(wd), "--k", "10", "--num-samples", "4",
         "--num-images", "6", "--batch-size", "4", "--rank", "logp",
         "--decode", "fused"]
    )
    assert rc == 2

    # temperature × rank sweep in ONE process (traced-temp sampler): every
    # combo reports, tagged, including per-combo zero-shot + mR lines
    rc = cli_evaluate.main(
        ["--workdir", str(wd), "--k", "10", "--num-samples", "4",
         "--num-images", "6", "--batch-size", "4",
         "--temperature", "0.7,1.3", "--rank", "freq,logp",
         "--zero-shot", "--per-predicate"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    for tag in ("T=0.7 rank=freq", "T=0.7 rank=logp",
                "T=1.3 rank=freq", "T=1.3 rank=logp"):
        assert tag in out
    assert out.count("recall@10") >= 4 and out.count("zsR@10") == 4
    assert out.count("mR@10") == 4
    # sweeps are XLA-sampler-only on the fused kernel
    rc = cli_evaluate.main(
        ["--workdir", str(wd), "--k", "10", "--num-samples", "4",
         "--num-images", "6", "--batch-size", "4",
         "--temperature", "0.7,1.3", "--decode", "fused"]
    )
    assert rc == 2

    # predicate-adjust α sweep: host-side re-ranking, combos tagged adj=;
    # α=0 is the unadjusted logp reference in the same run
    rc = cli_evaluate.main(
        ["--workdir", str(wd), "--k", "10", "--num-samples", "4",
         "--num-images", "6", "--batch-size", "4", "--rank", "logp",
         "--predicate-adjust", "0,0.5,1.0"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "T=1 rank=logp adj=0.5" in out and "adj=1" in out
    assert out.count("recall@10") == 3

    # exclude-seen sweep: novel-only combos filter train-seen triples
    # host-side before ranking (decode-time zsR lever); both settings come
    # from the same samples and are tagged
    json_path = tmp_path / "ex_sweep.json"
    rc = cli_evaluate.main(
        ["--workdir", str(wd), "--k", "10", "--num-samples", "4",
         "--num-images", "6", "--batch-size", "4", "--rank", "freq,logp",
         "--exclude-seen", "sweep", "--zero-shot",
         "--json-out", str(json_path)]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("novel-only") >= 2
    import json as _json

    with open(json_path) as f:
        grid = _json.load(f)["combos"]
    flags = {(c["rank"], c["exclude_seen"]) for c in grid}
    assert flags == {("freq", False), ("freq", True),
                     ("logp", False), ("logp", True)}
    # the filter can only remove candidates: plain-R of novel-only <= plain
    for rank in ("freq", "logp"):
        plain = [c for c in grid if c["rank"] == rank
                 and not c["exclude_seen"]][0]
        novel = [c for c in grid if c["rank"] == rank
                 and c["exclude_seen"]][0]
        assert novel["recall"]["10"] <= plain["recall"]["10"] + 1e-9

    # num-samples saturation sweep: one sampling pass at max K, smaller Ks
    # are draw prefixes (K= tags; samples/image reports the combo's K)
    rc = cli_evaluate.main(
        ["--workdir", str(wd), "--k", "10", "--num-samples", "2,4",
         "--num-images", "6", "--batch-size", "4"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "K=2" in out and "K=4" in out
    assert "samples/image=2" in out and "samples/image=4" in out
    assert out.count("recall@10") == 2

    # --ema against a run trained WITHOUT EMA fails cleanly, not mid-sample.
    wd2 = tmp_path / "run_plain"
    assert cli_train.main(train_args(wd2, ema=False)) == 0
    rc = cli_evaluate.main(
        ["--workdir", str(wd2), "--k", "10",
         "--num-samples", "4", "--num-images", "4", "--ema"]
    )
    assert rc == 1


def test_train_encoder_ckpt_and_finetune(tmp_path):
    """--encoder-ckpt initializes the backbone from pretrain-format npz and
    train.train_encoder fine-tunes it: the checkpointed enc_params must
    differ from the loaded init after 2 steps (and the loader must reject
    precomputed configs)."""
    import jax
    import numpy as np

    from sgg.models.encoders import make_encoder
    from sgg.train.pretrain import load_params_npz, save_params_npz

    enc = make_encoder("vgg19", dtype=np.float32, image_size=16)
    enc_params = enc.init(jax.random.key(11), np.zeros((1, 16, 16, 3), np.float32))
    npz = tmp_path / "encoder_params.npz"
    save_params_npz(str(npz), enc_params["params"])

    wd = str(tmp_path / "ft_run")
    args = [
        "--config", "smoke", "--workdir", wd,
        "--set", "model.encoder=vgg19",
        "--set", "data.image_size=16",
        "--set", "data.regions=1",
        "--set", "data.feat_dim=512",
        "--set", "data.num_synthetic_images=16",
        "--set", "train.batch_size=2",
        "--set", "train.n_critic=1",
        "--set", "train.train_encoder=True",
        "--set", "train.checkpoint_every=2",
        "--set", "mesh.data=1", "--set", "mesh.model=1",
        "--encoder-ckpt", str(npz),
        "--steps", "2",
    ]
    assert cli_train.main(args) == 0

    from sgg.train.checkpoint import CheckpointManager, load_workdir
    from sgg.train.state import create_train_state

    cfg, _ = load_workdir(wd)
    restored = CheckpointManager(wd, cfg).restore(
        create_train_state(cfg, jax.random.key(0))
    )
    init = load_params_npz(str(npz))
    moved = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).sum())
        for a, b in zip(
            jax.tree.leaves(restored.enc_params["params"]),
            jax.tree.leaves(init),
        )
    )
    assert moved > 0  # fine-tuning actually moved the backbone

    # precomputed config → clean failure
    rc = cli_train.main([
        "--config", "smoke", "--workdir", str(tmp_path / "bad"),
        "--encoder-ckpt", str(npz), "--steps", "1",
    ])
    assert rc == 1


def test_train_with_eval_probe(tmp_path, capsys):
    """In-loop held-out probe (train.eval_every): runs on schedule, logs
    recall@k, and tracks the best step in workdir/best_eval.json."""
    data = tmp_path / "data"
    wd = tmp_path / "run"
    assert cli_preprocess.main(
        ["--out-dir", str(data), "--synthetic", "64",
         "--regions", "9", "--feat-dim", "16"]
    ) == 0
    args = [
        "--config", "smoke",
        "--workdir", str(wd),
        "--set", "data.source=shards",
        "--set", f"data.data_dir={data}",
        "--set", "data.regions=9",
        "--set", "data.feat_dim=16",
        "--set", "train.checkpoint_every=6",
        "--set", "train.eval_every=3",
        "--set", "train.eval_images=16",
        "--set", "train.eval_samples=4",
        "--set", "train.eval_k=20",
        "--steps", "6",
    ]
    assert cli_train.main(args) == 0
    out = capsys.readouterr().out
    assert "eval step 3: recall@20" in out
    assert "eval step 6: recall@20" in out
    best = json.loads((wd / "best_eval.json").read_text())
    assert best["k"] == 20 and best["step"] in (3, 6)
    assert 0.0 <= best["recall"] <= 1.0
    # eval_images caps at the held-out split size (64 × 0.1 ≈ 6 here)
    assert 0 < best["images"] <= 16 and best["ema"] is False
