"""Data layer tests: window/shard math, catalog grouping, HDF5 reads,
lightning rasterization, preprocessing, augmentation determinism, loaders,
and datamodule splits — all against the synthetic SEVIR fixture."""

import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.data.catalog import build_event_index
from weatherforecastingtoolkit_tpu.data.dataset import (SEVIRDataset, augment_thw,
                                                        downsample_hwt,
                                                        preprocess_array,
                                                        process_back)
from weatherforecastingtoolkit_tpu.data.datamodule import SEVIRDataModule
from weatherforecastingtoolkit_tpu.data.hdf5 import SEVIRReader, lght_to_grid
from weatherforecastingtoolkit_tpu.data.prefetch import BatchLoader, device_prefetch
from weatherforecastingtoolkit_tpu.data.synthetic import make_synthetic_sevir
from weatherforecastingtoolkit_tpu.data.windows import (WindowIndex,
                                                        num_seq_per_event,
                                                        shard_event_range)


@pytest.fixture(scope="module")
def sevir_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sevir")
    make_synthetic_sevir(str(root), num_events=6, height=32, width=32,
                         raw_seq_len=25, data_types=("vil", "lght"))
    return str(root)


# ------------------------------------------------------------- window math
def test_num_seq_per_event():
    # reference diagram: raw 49, seq 25, stride 12 -> 1 + 24//12 = 3
    assert num_seq_per_event(49, 25, 12) == 3
    assert num_seq_per_event(25, 25, 12) == 1
    assert num_seq_per_event(49, 13, 12) == 4
    with pytest.raises(ValueError):
        num_seq_per_event(25, 49, 12)


def test_window_locate():
    wi = WindowIndex(num_events=4, raw_seq_len=49, seq_len=25, stride=12)
    assert len(wi) == 12
    assert wi.locate(0) == (0, slice(0, 25))
    assert wi.locate(1) == (0, slice(12, 37))
    assert wi.locate(2) == (0, slice(24, 49))
    assert wi.locate(3) == (1, slice(0, 25))
    assert wi.locate(11) == (3, slice(24, 49))
    with pytest.raises(IndexError):
        wi.locate(12)


@pytest.mark.parametrize("total,shards", [(10, 3), (12, 4), (7, 2)])
def test_shard_math(total, shards):
    # uneven: covers all events exactly once, last shard takes remainder
    spans = [shard_event_range(total, shards, r, "uneven") for r in range(shards)]
    covered = [i for s, e in spans for i in range(s, e)]
    assert covered == list(range(total))
    # floor: equal sizes, tail dropped
    spans = [shard_event_range(total, shards, r, "floor") for r in range(shards)]
    sizes = [e - s for s, e in spans]
    assert len(set(sizes)) == 1 and sizes[0] == total // shards
    # ceil: equal sizes >= floor, full coverage
    spans = [shard_event_range(total, shards, r, "ceil") for r in range(shards)]
    sizes = [e - s for s, e in spans]
    assert len(set(sizes)) == 1
    assert spans[-1][1] >= total


# ------------------------------------------------------------- lightning
def test_lght_to_grid_counts():
    # two strikes at same pixel/time bin, one out of grid
    data = np.array([
        [0.0, 0, 0, 5, 7],
        [1.0, 0, 0, 5, 7],
        [0.0, 0, 0, 99, 7],   # x out of grid
        [-7300.0, 0, 0, 1, 1],  # before first frame -> frame 0
    ], dtype=np.float32)
    grid = lght_to_grid(data)
    assert grid.shape == (48, 48, 49)
    t_bin = np.digitize(0.0, np.arange(-120.0, 125.0, 5) * 60) - 1
    assert grid[7, 5, t_bin] == 2
    assert grid[1, 1, 0] == 1
    assert grid.sum() == 3


def test_lght_empty():
    assert lght_to_grid(np.zeros((0, 5))).sum() == 0


# ------------------------------------------------------------- preprocess
def test_preprocess_roundtrip(rng):
    raw = (rng.random((8, 8, 4)) * 255).astype(np.uint8)
    for method in ("01", "sevir"):
        x = preprocess_array(raw, "vil", method)
        back = process_back(x, "vil", method)
        np.testing.assert_allclose(back, raw.astype(np.float32), atol=1e-3)
    assert preprocess_array(raw, "vil", "01").max() <= 1.0
    assert preprocess_array(raw, "vil", "01_uint8").dtype == np.uint8


def test_downsample():
    x = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    x = np.repeat(x, 6, axis=2)
    d = downsample_hwt(x, t_factor=2, h_factor=2, w_factor=2)
    assert d.shape == (2, 2, 3)
    assert d[0, 0, 0] == pytest.approx(np.mean([0, 1, 4, 5]))


# ------------------------------------------------------------- augmentation
def test_augment_deterministic(rng):
    x = rng.random((5, 16, 16)).astype(np.float32)
    r1 = augment_thw(x, "2", np.random.default_rng(42))
    r2 = augment_thw(x, "2", np.random.default_rng(42))
    np.testing.assert_array_equal(r1, r2)
    assert augment_thw(x, "0", np.random.default_rng(0)) is x


def test_augment_mode1_nearest_matches_reference_interp(rng):
    """Mode-'1' rotation defaults to NEAREST like the reference's
    torchvision RandomRotation (sevir/sevir.py:1037-1041): no pixel value
    that wasn't in the input may appear; bilinear (opt-in) interpolates."""
    data = (rng.random((2, 16, 16)) > 0.5).astype(np.float32)  # binary frame
    out_n = augment_thw(data.copy(), "1", np.random.default_rng(3))
    assert set(np.unique(out_n)) <= {0.0, 1.0}
    out_b = augment_thw(data.copy(), "1", np.random.default_rng(3),
                        interp="bilinear")
    assert len(np.unique(out_b)) > 2  # interpolated intermediate values
    with pytest.raises(ValueError):
        augment_thw(data, "1", np.random.default_rng(0), interp="nope")


def test_augment_mode1_preserves_shape(rng):
    x = rng.random((3, 16, 16)).astype(np.float32)
    out = augment_thw(x, "1", np.random.default_rng(7))
    assert out.shape == x.shape


# ------------------------------------------------------------- catalog + reader
def test_event_index(sevir_root):
    idx = build_event_index(f"{sevir_root}/CATALOG.csv", ("vil", "lght"))
    assert len(idx) == 6
    ev = idx[0]
    assert set(ev.files) == {"vil", "lght"}
    assert isinstance(ev.indices["vil"], int)


def test_reader_window(sevir_root):
    idx = build_event_index(f"{sevir_root}/CATALOG.csv", ("vil",))
    reader = SEVIRReader(f"{sevir_root}/data")
    full = reader.read_window(idx[0], "vil")
    assert full.shape == (32, 32, 25) and full.dtype == np.uint8
    win = reader.read_window(idx[0], "vil", slice(5, 18))
    np.testing.assert_array_equal(win, full[:, :, 5:18])
    reader.close()


# ------------------------------------------------------------- dataset
def test_dataset_layout_and_range(sevir_root):
    ds = SEVIRDataset(
        catalog=f"{sevir_root}/CATALOG.csv", data_dir=f"{sevir_root}/data",
        data_types=("vil",), seq_len=13, raw_seq_len=25, stride=12,
        layout="NTCHW")
    assert len(ds) == 6 * 2  # 1 + 12//12 = 2 windows per event
    s = ds[0]["vil"]
    assert s.shape == (13, 1, 32, 32)
    assert 0.0 <= s.min() and s.max() <= 1.0 and s.dtype == np.float32


def test_dataset_sharding_partition(sevir_root):
    full = SEVIRDataset(catalog=f"{sevir_root}/CATALOG.csv",
                        data_dir=f"{sevir_root}/data", seq_len=25,
                        raw_seq_len=25, stride=12, layout="NTHW")
    shards = [SEVIRDataset(catalog=f"{sevir_root}/CATALOG.csv",
                           data_dir=f"{sevir_root}/data", seq_len=25,
                           raw_seq_len=25, stride=12, layout="NTHW",
                           num_shard=2, rank=r, split_mode="uneven")
              for r in range(2)]
    assert sum(len(s) for s in shards) == len(full)
    # the shards' first samples differ (different event ranges)
    assert not np.array_equal(shards[0][0]["vil"], shards[1][0]["vil"])


# ------------------------------------------------------------- loader + prefetch
def test_batch_loader(sevir_root):
    ds = SEVIRDataset(catalog=f"{sevir_root}/CATALOG.csv",
                      data_dir=f"{sevir_root}/data", seq_len=13,
                      raw_seq_len=25, stride=12, layout="NTCHW")
    loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=0, num_workers=2)
    assert len(loader) == len(ds) // 4
    batches = list(loader)
    assert len(batches) == len(loader)
    assert batches[0]["vil"].shape == (4, 13, 1, 32, 32)
    # deterministic given (seed, epoch)
    again = list(loader)
    np.testing.assert_array_equal(batches[0]["vil"], again[0]["vil"])
    loader.set_epoch(1)
    shuffled = list(loader)
    assert not np.array_equal(batches[0]["vil"], shuffled[0]["vil"])


def test_device_prefetch(sevir_root):
    import jax
    ds = SEVIRDataset(catalog=f"{sevir_root}/CATALOG.csv",
                      data_dir=f"{sevir_root}/data", seq_len=13,
                      raw_seq_len=25, stride=12, layout="NTCHW")
    loader = BatchLoader(ds, batch_size=2, num_workers=2)
    n = 0
    for batch in device_prefetch(loader, prefetch=2):
        assert isinstance(batch["vil"], jax.Array)
        n += 1
    assert n == len(loader)


# ------------------------------------------------------------- datamodule
def test_datamodule_splits(sevir_root):
    dm = SEVIRDataModule(dataset_name="sevirlr", sevir_dir=sevir_root,
                         seq_len=13, stride=12, layout="NTCHW", batch_size=2,
                         num_workers=2, val_ratio=0.25,
                         train_test_split_date=(2019, 1, 20))
    dm.prepare_data()
    dm.setup()
    # 6 events split by date 2019-01-20: events 0,1,2 (Jan 1,8,15) train+val
    n_train_val = dm.num_train_samples + dm.num_val_samples
    assert n_train_val > 0 and dm.num_test_samples > 0
    assert n_train_val + dm.num_test_samples == 12  # 6 events x 2 windows
    b = next(iter(dm.train_loader()))
    assert b["vil"].shape[0] == 2
    # datamodule rejects bad names / layouts
    with pytest.raises(ValueError):
        SEVIRDataModule(dataset_name="nope", sevir_dir=sevir_root)
    with pytest.raises(ValueError):
        SEVIRDataModule(dataset_name="sevirlr", sevir_dir=sevir_root, layout="TNHW")


def test_datamodule_cached_path_bit_identical(sevir_root, tmp_path):
    """use_cache=True must serve bit-identical samples for every split,
    including the shuffled-train event permutation and the random val split."""
    kw = dict(dataset_name="sevirlr", sevir_dir=sevir_root, seq_len=13,
              stride=12, layout="NTCHW", batch_size=2, num_workers=2,
              val_ratio=0.25, train_test_split_date=(2019, 1, 20), seed=3)
    dm_h5 = SEVIRDataModule(**kw)
    dm_c = SEVIRDataModule(use_cache=True, cache_dir=str(tmp_path / "pc"), **kw)
    for dm in (dm_h5, dm_c):
        dm.prepare_data()
        dm.setup()
    for split in ("sevir_train", "sevir_val", "sevir_test"):
        a, b = getattr(dm_h5, split), getattr(dm_c, split)
        assert len(a) == len(b), split
        for i in range(len(a)):
            np.testing.assert_array_equal(a[i]["vil"], b[i]["vil"],
                                          err_msg=f"{split}[{i}]")
    # second setup() reuses the cache (meta validates) instead of rebuilding
    import os
    mtime = os.path.getmtime(str(tmp_path / "pc" / "train_vil.npy"))
    dm_c.setup()
    assert os.path.getmtime(str(tmp_path / "pc" / "train_vil.npy")) == mtime


# ------------------------------------------------------------- sequent/random iterator
def test_sequent_iterator_pad_mask(sevir_root):
    from weatherforecastingtoolkit_tpu.data.dataset import SEVIRSequentIterator
    ds = SEVIRDataset(catalog=f"{sevir_root}/CATALOG.csv",
                      data_dir=f"{sevir_root}/data", seq_len=13,
                      raw_seq_len=25, stride=12, layout="NTCHW")
    # 12 samples, batch 5 -> 2 full + 1 padded batch (2 real + 3 pad)
    it = SEVIRSequentIterator(ds, batch_size=5, sample_mode="sequent")
    batches = list(it)
    assert len(batches) == 3
    assert "mask" not in batches[0]
    last = batches[-1]
    assert last["mask"] == [True, True, False, False, False]
    assert last["vil"][2:].sum() == 0  # padded entries zeroed
    assert it.use_up
    it.reset()
    assert not it.use_up


def test_random_iterator(sevir_root):
    from weatherforecastingtoolkit_tpu.data.dataset import SEVIRSequentIterator
    ds = SEVIRDataset(catalog=f"{sevir_root}/CATALOG.csv",
                      data_dir=f"{sevir_root}/data", seq_len=13,
                      raw_seq_len=25, stride=12, layout="NTCHW")
    it = SEVIRSequentIterator(ds, batch_size=3, sample_mode="random", seed=1)
    b1 = next(it)
    b2 = next(it)
    assert b1["vil"].shape == (3, 13, 1, 32, 32)
    assert not it.use_up  # random mode never exhausts
    assert not np.array_equal(b1["vil"], b2["vil"])


# ------------------------------------------------------------- offline downsampler
def test_save_downsampled_dataset(sevir_root, tmp_path):
    from weatherforecastingtoolkit_tpu.data.downsample_writer import (
        save_downsampled_dataset)

    ds = SEVIRDataset(catalog=f"{sevir_root}/CATALOG.csv",
                      data_dir=f"{sevir_root}/data", data_types=("vil",),
                      seq_len=25, raw_seq_len=25, stride=12, layout="NTHW")
    out = str(tmp_path / "down")
    catalog = save_downsampled_dataset(ds, out, {"vil": (1, 2, 2)},
                                       method="max", verbose=False)
    # the downsampled tree loads with the normal dataset at half resolution
    ds2 = SEVIRDataset(catalog=catalog, data_dir=f"{out}/data",
                       data_types=("vil",), seq_len=25, raw_seq_len=25,
                       stride=12, layout="NTHW")
    assert len(ds2) == len(ds)
    s2 = ds2[0]["vil"]
    assert s2.shape == (25, 16, 16)  # 32 -> 16
    # max pooling commutes with the 1/255 rescale: values must match exactly
    s1 = ds[0]["vil"]  # (25, 32, 32)
    manual = s1.reshape(25, 16, 2, 16, 2).max(axis=(2, 4))
    np.testing.assert_allclose(s2, manual, atol=1e-6)
    # dates preserved -> date-based splits survive
    ev = ds2.events[0]
    assert ev.time_utc is not None


def test_dataset_runtime_downsample(sevir_root):
    ds = SEVIRDataset(catalog=f"{sevir_root}/CATALOG.csv",
                      data_dir=f"{sevir_root}/data", data_types=("vil",),
                      seq_len=24, raw_seq_len=25, stride=12, layout="NTHW",
                      downsample={"vil": (2, 2, 2)})
    s = ds[0]["vil"]
    assert s.shape == (12, 16, 16)  # T 24->12, HW 32->16
