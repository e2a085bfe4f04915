"""Packed array-record cache: SEVIR events as one memory-mapped raw array.

The reference measured its HDF5 pipeline I/O-bound (61% system time,
reference pipeline/datasets/sevir/test.py:42-72) and its .npy-per-frame cache
attempt failed on small-file overhead (reference failed/npy_dataset/*,
"bottleneck is in I/O confirmed by scalene profiler"). The fix is neither:
pack the whole split into ONE contiguous raw-dtype array, memory-mapped, so a
training window is a zero-copy strided view served from the OS page cache —
no HDF5 chunk decode, no per-file opens, no float conversion (uint8 flows to
the device; see hdf5.py docstring).

Layout on disk:
  <cache_dir>/<split>_<type>.npy     (N_events, H, W, raw_seq_len) raw dtype
  <cache_dir>/<split>_meta.json      event ids + geometry + provenance
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

from .catalog import EventIndex
from .dataset import SEVIRDataset


def cache_valid(cache_dir: str, split: str, event_ids: Sequence[str],
                data_types: Sequence[str], raw_seq_len: int) -> bool:
    """True iff a packed cache for `split` exists and matches the expected
    event set (same ids, same order), data types, and frame count."""
    meta_path = os.path.join(cache_dir, f"{split}_meta.json")
    if not os.path.exists(meta_path):
        return False
    try:
        with open(meta_path) as f:
            meta = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    if meta.get("event_ids") != [str(e) for e in event_ids]:
        return False
    if meta.get("raw_seq_len") != raw_seq_len:
        return False
    if not set(data_types) <= set(meta.get("data_types", ())):
        return False
    if meta.get("num_events", 0) == 0:
        return True  # empty split: no array files to check
    return all(os.path.exists(os.path.join(cache_dir, f"{split}_{t}.npy"))
               for t in data_types)


def build_cache(dataset: SEVIRDataset, cache_dir: str, split: str = "train",
                verbose: bool = True) -> str:
    """Pack every event of `dataset` into the mmap cache. Returns cache_dir.

    Reads raw (pre-rescale) windows so the cache is dtype-exact with the
    HDF5 source.
    """
    os.makedirs(cache_dir, exist_ok=True)
    events = dataset.events
    n = len(events)
    meta: Dict = {"split": split, "num_events": n,
                  "raw_seq_len": dataset.windows.raw_seq_len,
                  "data_types": list(dataset.data_types), "event_ids": [],
                  "shapes": {}}
    arrays = {}
    for i in range(n):
        ev = events[i]
        meta["event_ids"].append(ev.event_id)
        for t in dataset.data_types:
            raw = dataset.reader.read_window(ev, t)  # full (H, W, T), raw dtype
            if t not in arrays:
                arrays[t] = np.lib.format.open_memmap(
                    os.path.join(cache_dir, f"{split}_{t}.npy"), mode="w+",
                    dtype=raw.dtype, shape=(n,) + raw.shape)
                meta["shapes"][t] = [int(s) for s in raw.shape]
            arrays[t][i] = raw
        if verbose and (i + 1) % 100 == 0:
            print(f"[cache] packed {i + 1}/{n} events")
    for arr in arrays.values():
        arr.flush()
    with open(os.path.join(cache_dir, f"{split}_meta.json"), "w") as f:
        json.dump(meta, f)
    return cache_dir


class CachedSEVIRDataset:
    """Map-style dataset over a packed cache — same sample contract as
    SEVIRDataset (dict of layout-transformed arrays, batch axis stripped)."""

    def __init__(self, cache_dir: str, split: str = "train",
                 data_types: Optional[Sequence[str]] = None,
                 seq_len: int = 25, stride: int = 12, layout: str = "NTHWC",
                 rescale_method: str = "01", aug_mode: str = "0",
                 aug_seed: int = 0, aug_interp: str = "nearest",
                 num_shard: int = 1, rank: int = 0,
                 split_mode: str = "uneven",
                 event_perm: Optional[Sequence[int]] = None):
        from .dataset import augment_thw, preprocess_array
        from .windows import WindowIndex, shard_event_range
        from ..ops.layout import change_layout

        self._augment = augment_thw
        self._preprocess = preprocess_array
        self._change_layout = change_layout

        with open(os.path.join(cache_dir, f"{split}_meta.json")) as f:
            self.meta = json.load(f)
        self.data_types = tuple(data_types or self.meta["data_types"])
        total = self.meta["num_events"]
        self.arrays = {
            t: np.load(os.path.join(cache_dir, f"{split}_{t}.npy"),
                       mmap_mode="r")
            for t in self.data_types} if total else {}
        # optional event reorder (e.g. the DataModule's shuffle permutation);
        # the cache itself always stays in canonical catalog order
        if event_perm is None:
            self.event_order = np.arange(total)
        else:
            self.event_order = np.asarray(event_perm, dtype=np.int64)
            if len(self.event_order) != total:
                raise ValueError(
                    f"event_perm has {len(self.event_order)} entries for "
                    f"{total} cached events")
        start, end = shard_event_range(total, num_shard, rank, split_mode)
        self._start = start
        self._n_events = min(end, total) - start
        self._ceil_pad = max(0, end - total)
        self.layout = layout
        self.rescale_method = rescale_method
        self.aug_mode = aug_mode
        self.aug_seed = aug_seed
        self.aug_interp = aug_interp
        self.epoch = 0
        self.windows = WindowIndex(
            num_events=self._n_events + self._ceil_pad,
            raw_seq_len=self.meta["raw_seq_len"], seq_len=seq_len,
            stride=stride)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def __len__(self) -> int:
        return len(self.windows)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        event_idx, t_slice = self.windows.locate(index)
        ev = int(self.event_order[
            self._start + (event_idx % max(1, self._n_events))])
        out = {}
        aug_rng = None
        if self.aug_mode != "0":
            aug_rng = np.random.default_rng(
                np.random.SeedSequence([self.aug_seed, self.epoch, index]))
        for t in self.data_types:
            arr = np.asarray(self.arrays[t][ev, :, :, t_slice])
            arr = self._preprocess(arr, t, self.rescale_method)
            if aug_rng is not None:
                arr = self._augment(arr.transpose(2, 0, 1), self.aug_mode,
                                    aug_rng, self.aug_interp).transpose(1, 2, 0)
            transformed = self._change_layout(arr[None], "NHWT", self.layout)
            out[t] = transformed.take(0, axis=self.layout.index("N"))
        return out
