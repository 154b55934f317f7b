"""Comet artifact download path (tracking/artifacts.py) exercised against a
fake API — the registry starts empty until runs of this framework are
published, so this pins the retrieval logic (latest-epoch regex, asset
matching, local caching) without network or credentials."""

import pytest

from vision_mtl_tpu.tracking import artifacts


class _FakeExp:
    id = "exp123"

    def __init__(self, assets):
        self._assets = assets

    def get_asset_list(self, asset_type="all"):
        return self._assets


class _FakeAPI:
    def __init__(self, assets):
        self._assets = assets
        self.downloads = []

    def get(self, path):
        return _FakeExp(self._assets)

    def download_experiment_asset(self, exp_id, asset_id, dst):
        self.downloads.append((exp_id, asset_id, dst))
        with open(dst, "w") as f:
            f.write(f"payload:{asset_id}")


_ASSETS = [
    {"fileName": "model_3", "assetId": "a1"},
    {"fileName": "model_12", "assetId": "a2"},
    {"fileName": "session_12", "assetId": "a3"},
    {"fileName": "train_args.yaml", "assetId": "a4"},
    {"fileName": "notes.txt", "assetId": "a5"},
]


def test_get_latest_ckpt_epoch_regex():
    api = _FakeAPI(_ASSETS)
    assert artifacts.get_latest_ckpt_epoch("run", api=api, project_name="p") == 12


def test_get_latest_ckpt_epoch_no_ckpts_raises():
    api = _FakeAPI([{"fileName": "notes.txt", "assetId": "x"}])
    with pytest.raises(ValueError, match="No checkpoints"):
        artifacts.get_latest_ckpt_epoch("run", api=api, project_name="p")


def test_load_artifacts_downloads_latest(tmp_path):
    api = _FakeAPI(_ASSETS)
    out = artifacts.load_artifacts_from_comet(
        "run",
        str(tmp_path),
        session_artifact_name="session_12",
        project_name="p",
        api=api,
    )
    assert out["checkpoint_path"].endswith("model_12")
    assert out["args_path"].endswith("train_args.yaml")
    assert out["session_path"].endswith("session_12")
    with open(out["checkpoint_path"]) as f:
        assert f.read() == "payload:a2"
    # cached: a second call downloads nothing new
    n = len(api.downloads)
    out2 = artifacts.load_artifacts_from_comet(
        "run", str(tmp_path), project_name="p", api=api, epoch=12
    )
    assert out2["checkpoint_path"] == out["checkpoint_path"]
    assert len(api.downloads) == n


def test_load_artifacts_missing_asset_is_none(tmp_path, capsys):
    api = _FakeAPI([{"fileName": "model_1", "assetId": "a1"}])
    out = artifacts.load_artifacts_from_comet(
        "run", str(tmp_path), project_name="p", api=api, epoch=1
    )
    assert out["checkpoint_path"].endswith("model_1")
    assert out["args_path"] is None
    assert "No asset found" in capsys.readouterr().out


def test_epoch_match_is_anchored(tmp_path):
    """model_1 must not match model_12's assets (substring trap)."""
    api = _FakeAPI(
        [
            {"fileName": "model_12", "assetId": "big"},
            {"fileName": "model_1", "assetId": "small"},
        ]
    )
    out = artifacts.load_artifacts_from_comet(
        "run", str(tmp_path), project_name="p", api=api, epoch=1
    )
    with open(out["checkpoint_path"]) as f:
        assert f.read() == "payload:small"


def test_multifile_orbax_dir_download(tmp_path):
    """Orbax checkpoints are logged as per-file assets under model_{e}/...;
    all files must land at their original relative paths."""
    api = _FakeAPI(
        [
            {"fileName": "model_7/manifest.ocdbt", "assetId": "m"},
            {"fileName": "model_7/d/data0", "assetId": "d0"},
            {"fileName": "model_70/manifest.ocdbt", "assetId": "other"},
        ]
    )
    out = artifacts.load_artifacts_from_comet(
        "run", str(tmp_path), project_name="p", api=api, epoch=7
    )
    root = out["checkpoint_path"]
    assert root.endswith("model_7")
    with open(f"{root}/manifest.ocdbt") as f:
        assert f.read() == "payload:m"
    with open(f"{root}/d/data0") as f:
        assert f.read() == "payload:d0"
    assert len(api.downloads) == 2  # model_70 untouched


def test_hostile_asset_names_are_skipped(tmp_path, capsys):
    """Remote-controlled fileNames must not escape the artifacts dir, and
    an asset named exactly like the prefix must not shadow the directory
    its siblings populate."""
    api = _FakeAPI(
        [
            {"fileName": "model_2/../../evil", "assetId": "e1"},
            {"fileName": "model_2", "assetId": "shadow"},
            {"fileName": "model_2/ok", "assetId": "good"},
        ]
    )
    out = artifacts.load_artifacts_from_comet(
        "run", str(tmp_path), project_name="p", api=api, epoch=2
    )
    root = out["checkpoint_path"]
    with open(f"{root}/ok") as f:
        assert f.read() == "payload:good"
    dsts = [d for _, _, d in api.downloads]
    assert all(str(tmp_path) in d for d in dsts)
    assert len(api.downloads) == 1  # evil + shadow both skipped
    captured = capsys.readouterr().out
    assert "escapes" in captured and "names the" in captured


# ---------------------------------------------------------------------------
# Local trained-run registry (the auto-populated equivalent of the
# reference's hardcoded comet run table, comet_utils.py:9-30)
# ---------------------------------------------------------------------------


def test_registry_roundtrip_and_newest_wins(tmp_path):
    reg = str(tmp_path / "run_registry.json")
    run_a = tmp_path / "version_0"
    run_b = tmp_path / "version_1"
    run_a.mkdir()
    run_b.mkdir()
    artifacts.register_run("basic", "cityscapes", str(run_a), path=reg)
    artifacts.register_run("mtan", "cityscapes", str(run_b), path=reg)
    # same (key, dataset) again: newest run wins, like the reference
    # updating its table after a better run
    artifacts.register_run("basic", "cityscapes", str(run_b), path=reg)
    # same key, other dataset: independent slot
    artifacts.register_run("basic", "nyuv2", str(run_a), path=reg)

    got = artifacts.registered_runs("cityscapes", path=reg)
    assert set(got) == {"basic", "mtan"}
    assert got["basic"]["run_dir"] == str(run_b)
    assert got["basic"]["model_name"] == "basic"
    nyu = artifacts.registered_runs("nyuv2", path=reg)
    assert set(nyu) == {"basic"}
    assert nyu["basic"]["run_dir"] == str(run_a)


def test_registry_skips_deleted_run_dirs(tmp_path, capsys):
    reg = str(tmp_path / "run_registry.json")
    gone = tmp_path / "deleted_run"
    gone.mkdir()
    artifacts.register_run("csnet", "cityscapes", str(gone), path=reg)
    gone.rmdir()
    got = artifacts.registered_runs("cityscapes", path=reg)
    assert got == {}
    assert "no longer exists" in capsys.readouterr().out


def test_registry_key_derivation():
    import argparse

    def ns(**kw):
        base = dict(
            run_name=None,
            model_name="basic",
            backbone_weights=None,
            do_optimize=False,
        )
        base.update(kw)
        return argparse.Namespace(**base)

    assert artifacts.run_registry_key(ns()) == "basic"
    assert (
        artifacts.run_registry_key(ns(backbone_weights="imagenet"))
        == "basic_pretrained"
    )
    assert artifacts.run_registry_key(ns(do_optimize=True)) == "basic_tuned"
    # --run_name always wins
    assert artifacts.run_registry_key(ns(run_name="my_run")) == "my_run"


def test_registry_missing_file_is_empty(tmp_path):
    assert artifacts.load_registry(str(tmp_path / "nope.json")) == {}
    assert artifacts.registered_runs("cityscapes", path=str(tmp_path / "n.json")) == {}


def test_registry_rejects_non_object_json(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text("[1, 2, 3]")
    with pytest.raises(ValueError):
        artifacts.load_registry(str(bad))
