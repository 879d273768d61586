"""Remaining split-loading branches: combined, test_only, subtype HIPT
splits, hipt_val_proportion."""
import os

from paths_tpu.config import Config, PATHSProcessorConfig
from paths_tpu.data.dataset import load_splits
from paths_tpu.data.synthetic import make_synthetic_metadata, make_synthetic_store
from test_dataset import tiny_config


def _mk(tmp_path, n=10, subtypes=None, **cfg_kw):
    tmp = str(tmp_path)
    cfg = tiny_config(tmp, **cfg_kw)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=n,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids, subtypes=subtypes)
    return cfg, ids


def test_combined_dataset(tmp_path):
    cfg, ids = _mk(tmp_path)
    ds = load_splits([0.7, 0.15, 0.15], seed=0, config=cfg, combined=True,
                     preload=False)
    assert len(ds) == 10


def test_test_only(tmp_path):
    cfg, ids = _mk(tmp_path)
    ds = load_splits([0.6, 0.2, 0.2], seed=0, config=cfg, test_only=True,
                     preload=False)
    assert len(ds) == 2


def test_hipt_subtype_splits(tmp_path):
    cfg, ids = _mk(tmp_path, subtypes=["IDC", "ILC"],
                   task="subtype_classification",
                   filter_to_subtypes=["IDC", "ILC"])
    sdir = os.path.join(str(tmp_path), "splits", "subtype_classification",
                        "tcga_brca")
    os.makedirs(sdir)
    # subtype split files hold slide ids minus .svs, in train/val/test cols
    with open(os.path.join(sdir, "splits_0.csv"), "w") as f:
        f.write(",train,val,test\n")
        for i in range(6):
            val = ids[6 + i] if i < 2 else ""
            test = ids[8 + i] if i < 2 else ""
            f.write(f"{i},{ids[i]},{val},{test}\n")
    cfg.hipt_splits = True
    cfg.splits_dir = os.path.join(str(tmp_path), "splits")
    train, val, test = load_splits([0.7, 0.15, 0.15], seed=0, config=cfg,
                                   preload=False)
    assert len(train) == 6 and len(val) == 2 and len(test) == 2


def test_hipt_val_proportion(tmp_path):
    cfg, ids = _mk(tmp_path)
    sdir = os.path.join(str(tmp_path), "splits", "survival", "tcga_brca")
    os.makedirs(sdir)
    with open(os.path.join(sdir, "splits_0.csv"), "w") as f:
        f.write(",train,val\n")
        for i in range(8):
            t = f"CASE-{8 + i:04d}" if i < 2 else ""
            f.write(f"{i},CASE-{i:04d},{t}\n")
    cfg.hipt_splits = True
    cfg.hipt_val_proportion = 0.25
    cfg.splits_dir = os.path.join(str(tmp_path), "splits")
    train, val, test = load_splits([0.7, 0.15, 0.15], seed=0, config=cfg,
                                   preload=False)
    # 8 train cases -> 2 val, 6 train (reference dataset.py:103-106)
    assert len(val) == 2 and len(train) == 6 and len(test) == 2
