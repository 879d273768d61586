"""Experiment fan-out CLIs (mk_folds / mk_datasets) and split importer."""
import json
import os

from paths_tpu.cli.mk_datasets import main as mk_datasets
from paths_tpu.cli.mk_folds import main as mk_folds


def base_config():
    return {
        "wsi_dir": "/data/brca", "csv_path": "/data/brca_meta.csv.zip",
        "preprocess_dir": "/data/brca_uni", "seed": 0, "batch_size": 32,
        "base_power": 0.625, "magnification_factor": 2, "num_levels": 5,
        "num_epochs": 40, "top_k_patches": 20, "model_type": "PATHS",
        "model_config": {"lstm": True},
    }


def test_mk_folds(tmp_path):
    root = str(tmp_path / "models")
    os.makedirs(os.path.join(root, "exp_0"))
    with open(os.path.join(root, "exp_0", "config.json"), "w") as f:
        json.dump(base_config(), f)

    mk_folds(["-n", "exp", "-f", "3", "--root", root, "--force"])
    for i in range(3):
        with open(os.path.join(root, f"exp_{i}", "config.json")) as f:
            cfg = json.load(f)
        assert cfg["seed"] == i
        assert cfg["wsi_dir"] == "/data/brca"


def test_mk_folds_idempotent(tmp_path, capsys):
    root = str(tmp_path / "models")
    os.makedirs(os.path.join(root, "exp_0"))
    with open(os.path.join(root, "exp_0", "config.json"), "w") as f:
        json.dump(base_config(), f)
    mk_folds(["-n", "exp", "-f", "2", "--root", root, "--force"])
    mk_folds(["-n", "exp", "-f", "2", "--root", root, "--force"])
    assert "up to date" in capsys.readouterr().out


def test_mk_datasets(tmp_path):
    root = str(tmp_path / "models")
    src = os.path.join(root, "brca_paths_0")
    os.makedirs(src)
    with open(os.path.join(src, "config.json"), "w") as f:
        json.dump(base_config(), f)

    mk_datasets(["-s", src, "--force"])
    for ds in ["coadread", "kirc", "kirp", "luad"]:
        p = os.path.join(root, f"{ds}_paths_0", "config.json")
        assert os.path.isfile(p), p
        with open(p) as f:
            cfg = json.load(f)
        assert cfg["wsi_dir"] == f"/data/{ds}"
        assert cfg["preprocess_dir"] == f"/data/{ds}_uni"
        assert cfg["seed"] == 0


def test_import_reference_splits(tmp_path):
    # fake reference layout
    ref = tmp_path / "ref"
    (ref / "data" / "splits" / "survival" / "tcga_brca").mkdir(parents=True)
    (ref / "data" / "splits" / "survival" / "tcga_brca" / "splits_0.csv").write_text(
        ",train,val\n0,CASE-A,CASE-B\n")
    (ref / "data" / "gdc_manifests").mkdir()
    (ref / "data" / "gdc_manifests" / "brca.txt").write_text("id\tfile\n")

    import subprocess
    import sys

    out = tmp_path / "data"
    r = subprocess.run(
        [sys.executable, "tools/import_reference_splits.py",
         "--reference", str(ref), "--out", str(out)],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    assert (out / "splits" / "survival" / "tcga_brca" / "splits_0.csv").is_file()
    assert (out / "gdc_manifests" / "brca.txt").is_file()
