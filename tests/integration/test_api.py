"""High-level SceneGraphGenerator API over a trained workdir."""

import numpy as np
import pytest

from sgg.cli import preprocess as cli_preprocess
from sgg.cli import train as cli_train


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("api")
    assert cli_preprocess.main(
        ["--out-dir", str(d / "data"), "--synthetic", "32",
         "--regions", "9", "--feat-dim", "16"]
    ) == 0
    assert cli_train.main(
        ["--config", "smoke", "--workdir", str(d / "run"),
         "--set", "data.source=shards",
         "--set", f"data.data_dir={d / 'data'}",
         "--set", "data.regions=9", "--set", "data.feat_dim=16",
         "--set", "train.checkpoint_every=2", "--steps", "2"]
    ) == 0
    return str(d / "run")


def test_generate_from_features(workdir):
    from sgg.api import SceneGraphGenerator

    g = SceneGraphGenerator.from_workdir(workdir, num_samples=6, seed=1)
    feats = np.random.RandomState(0).randn(3, 9, 16).astype(np.float32)
    graphs = g.generate_from_features(feats)
    assert len(graphs) == 3
    for gr in graphs:
        assert sum(t["count"] for t in gr["triples"]) == 6
        s = gr["triples"][0]
        assert g.vocab.id(s["subject"]) > 1  # real tokens, not pad/unk


def test_generate_with_logp_rank_and_temperature(workdir):
    from sgg.api import SceneGraphGenerator

    g = SceneGraphGenerator.from_workdir(
        workdir, num_samples=6, seed=1, rank="logp", temperature=1.3
    )
    feats = np.random.RandomState(0).randn(3, 9, 16).astype(np.float32)
    graphs = g.generate_from_features(feats)
    assert len(graphs) == 3
    for gr in graphs:
        assert 1 <= len(gr["triples"]) <= 6
        assert {"subject", "predicate", "object"} <= set(gr["triples"][0])


def test_images_api_requires_encoder_config(workdir):
    from sgg.api import SceneGraphGenerator

    g = SceneGraphGenerator.from_workdir(workdir, num_samples=2)
    with pytest.raises(ValueError, match="precomputed"):
        g.generate_from_images(np.zeros((1, 16, 16, 3), np.uint8))


def test_missing_checkpoint_raises(tmp_path, workdir):
    import shutil

    from sgg.api import SceneGraphGenerator

    empty = tmp_path / "empty"
    empty.mkdir()
    shutil.copy(f"{workdir}/config.json", empty / "config.json")
    shutil.copy(f"{workdir}/vocab.json", empty / "vocab.json")
    with pytest.raises(FileNotFoundError):
        SceneGraphGenerator.from_workdir(str(empty))
