"""Real-SEVIR readiness: preflight checks against the reference data
contract (pipeline/datasets/sevir/sevir.py:104-908 + official SEVIR layout),
including schema strictness against a real CATALOG.csv header sample."""

import os

import numpy as np
import pandas as pd
import pytest

from weatherforecastingtoolkit_tpu.data.preflight import (PreflightError,
                                                          preflight)
from weatherforecastingtoolkit_tpu.data.synthetic import make_synthetic_sevir

# The full column set of the real SEVIR CATALOG.csv (recorded from the
# official release; the pipeline only touches a subset, but the schema check
# must accept the real header unchanged).
REAL_CATALOG_COLUMNS = [
    "id", "file_name", "file_index", "img_type", "time_utc",
    "minute_offsets", "episode_id", "event_id", "event_type", "llcrnrlat",
    "llcrnrlon", "urcrnrlat", "urcrnrlon", "proj", "size_x", "size_y",
    "height_m", "width_m", "data_min", "data_max", "pct_missing",
]


@pytest.fixture(scope="module")
def sevirlr_tree(tmp_path_factory):
    """Synthetic tree with REAL sevirlr geometry (128^2, 25 frames)."""
    root = str(tmp_path_factory.mktemp("sevirlr_real_geom"))
    make_synthetic_sevir(root, num_events=2, height=128, width=128,
                         raw_seq_len=25)
    return root


def test_preflight_ok_on_valid_tree(sevirlr_tree):
    rep = preflight(sevirlr_tree, dataset_name="sevirlr")
    assert rep.ok
    s = rep.summary()
    assert "OK" in s and "colocated events" in s


def test_preflight_catches_wrong_preset(sevirlr_tree):
    """Pointing the full-SEVIR preset (384^2/49f) at an LR tree must fail
    loudly — otherwise it surfaces as a mid-epoch window IndexError."""
    with pytest.raises(PreflightError) as ei:
        preflight(sevirlr_tree, dataset_name="sevir")
    msg = str(ei.value)
    assert "raw_seq_len" in msg or "384" in msg
    rep = preflight(sevirlr_tree, dataset_name="sevir", strict=False)
    assert not rep.ok


def test_preflight_catches_missing_columns(tmp_path, sevirlr_tree):
    root = str(tmp_path / "bad")
    os.makedirs(os.path.join(root, "data"))
    df = pd.read_csv(os.path.join(sevirlr_tree, "CATALOG.csv"))
    df.drop(columns=["pct_missing"]).to_csv(
        os.path.join(root, "CATALOG.csv"), index=False)
    rep = preflight(root, dataset_name="sevirlr", strict=False)
    assert not rep.ok
    assert any("pct_missing" in e for e in rep.errors)


def test_preflight_catches_missing_files(tmp_path, sevirlr_tree):
    root = str(tmp_path / "dangling")
    os.makedirs(os.path.join(root, "data"))
    df = pd.read_csv(os.path.join(sevirlr_tree, "CATALOG.csv"))
    df.to_csv(os.path.join(root, "CATALOG.csv"), index=False)
    rep = preflight(root, dataset_name="sevirlr", strict=False)
    assert not rep.ok
    assert any("missing" in e for e in rep.errors)


def test_preflight_accepts_real_catalog_header(tmp_path, sevirlr_tree):
    """The real release's full 21-column header (extra columns beyond what
    the pipeline reads) must pass the schema check and event grouping."""
    root = str(tmp_path / "realheader")
    os.makedirs(root)
    os.symlink(os.path.join(sevirlr_tree, "data"), os.path.join(root, "data"))
    base = pd.read_csv(os.path.join(sevirlr_tree, "CATALOG.csv"))
    rows = []
    for _, r in base.iterrows():
        row = {c: "" for c in REAL_CATALOG_COLUMNS}
        row.update(id=r["id"], file_name=r["file_name"],
                   file_index=r["file_index"], img_type=r["img_type"],
                   time_utc=r["time_utc"], pct_missing=r["pct_missing"],
                   minute_offsets=":".join(str(5 * i) for i in range(25)),
                   episode_id=11111, event_id=22222,
                   event_type="Thunderstorm Wind", llcrnrlat=30.5,
                   llcrnrlon=-91.2, urcrnrlat=34.3, urcrnrlon=-86.7,
                   proj="laea", size_x=128, size_y=128, height_m=384000,
                   width_m=384000, data_min=0.0, data_max=255.0)
        rows.append(row)
    pd.DataFrame(rows, columns=REAL_CATALOG_COLUMNS).to_csv(
        os.path.join(root, "CATALOG.csv"), index=False)
    rep = preflight(root, dataset_name="sevirlr")
    assert rep.ok, rep.summary()


def test_datamodule_runs_preflight(sevirlr_tree):
    from weatherforecastingtoolkit_tpu.data.datamodule import SEVIRDataModule

    dm = SEVIRDataModule(dataset_name="sevirlr", sevir_dir=sevirlr_tree,
                         seq_len=13, stride=12, run_preflight=True,
                         train_test_split_date=None)
    dm.prepare_data()  # passes on the valid tree

    dm_bad = SEVIRDataModule(dataset_name="sevir", sevir_dir=sevirlr_tree,
                             seq_len=13, stride=12, run_preflight=True,
                             train_test_split_date=None)
    with pytest.raises(PreflightError):
        dm_bad.prepare_data()


def test_preflight_empty_event_yield(tmp_path, sevirlr_tree):
    """All pct_missing > 0 -> 0 events after the default filter: hard fail
    instead of silently training on an empty split."""
    root = str(tmp_path / "allmissing")
    os.makedirs(root)
    os.symlink(os.path.join(sevirlr_tree, "data"), os.path.join(root, "data"))
    df = pd.read_csv(os.path.join(sevirlr_tree, "CATALOG.csv"))
    df["pct_missing"] = 0.5
    df.to_csv(os.path.join(root, "CATALOG.csv"), index=False)
    rep = preflight(root, dataset_name="sevirlr", strict=False)
    assert not rep.ok
    assert any("0 colocated events" in e for e in rep.errors)
