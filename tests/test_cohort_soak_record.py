"""Suite assertion over the committed epoch-scale cohort-soak record
(`examples/cohort_soak.py --record`, VERDICT r4 #3).

The record is generated on the dev chip and committed; this test keeps
its claims honest: a reference-scale cohort (300+ slides, >= 10 epochs)
trained through the streaming engine with BOUNDED host RAM (the axon
client leaks ~= bytes ever device_put — the naive fused path leaked
~3.2 GB/step and was OOM-killed in r3) and a held-out c-index above the
synthetic signal's bar. Skipped until the record exists.
"""
import json
import os

import pytest

RECORD = os.path.join(os.path.dirname(__file__), "..", "examples",
                      "records", "cohort_soak", "summary.json")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(RECORD), reason="cohort soak record not generated")


@pytest.fixture(scope="module")
def record():
    with open(RECORD) as f:
        return json.load(f)


def test_soak_scale_and_engine(record):
    assert record["engine"] == "streaming"
    assert record["slides"] >= 300
    assert record["epochs"] >= 10
    assert record["store_dtype"] == "float16"
    # the cohort actually occupies reference-like disk volume (memory-
    # mapped, never RAM-resident — vs the reference's full-RAM preload)
    assert record["store_gb"] > 3.0


def test_soak_host_ram_bounded(record):
    rss = {int(k): v for k, v in record["host_rss_mb"].items()}
    assert len(rss) == record["epochs"]
    # leak slope: linear-in-steps put-leak only (~30 MB/step => well under
    # 1.5 GB/epoch at ~7 steps/epoch); the naive path's 3.2 GB/STEP slope
    # would blow this bar by >15x
    assert record["rss_slope_mb_per_epoch"] is not None
    assert 0 <= record["rss_slope_mb_per_epoch"] < 1500
    # absolute ceiling: far under the 125 GB host (r3's naive run died)
    assert record["rss_mb_peak"] < 48_000


def test_soak_epoch_walls_stable(record):
    walls = {int(k): v for k, v in record["epoch_wall_s"].items()}
    later = [walls[e] for e in sorted(walls)[1:]]  # epoch 1 pays compiles
    med = sorted(later)[len(later) // 2]
    assert max(later) <= 2.5 * med, (walls, med)


def test_soak_learns_at_cohort_scale(record):
    # held-out c-index above the signal's documented bar (the dress
    # rehearsals' >= 0.80 test bar, relaxed slightly: 45-slide test split)
    assert record["test_metrics"]["test_c-index"] >= 0.75
    assert record["final_train_loss"] < 1.0


SUBTYPE_RECORD = os.path.join(os.path.dirname(RECORD),
                              "..", "cohort_soak_subtype", "summary.json")


def test_subtype_soak_record():
    """The classification twin at cohort scale (when recorded): same
    bounded-RAM bars, held-out AUC above the signal bar."""
    if not os.path.isfile(SUBTYPE_RECORD):
        pytest.skip("subtype cohort soak record not generated")
    with open(SUBTYPE_RECORD) as f:
        s = json.load(f)
    assert s["task"] == "subtype_classification"
    assert s["engine"] == "streaming"
    assert s["slides"] >= 300 and s["epochs"] >= 10
    assert 0 <= s["rss_slope_mb_per_epoch"] < 1500
    assert s["rss_mb_peak"] < 48_000
    assert s["test_metrics"]["test_AUC"] >= 0.75
