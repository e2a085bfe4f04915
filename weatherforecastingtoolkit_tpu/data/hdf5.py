"""HDF5 event reader for SEVIR, including lightning rasterization.

Capability parity with the reference's `_open_files` / `_read_data` /
`_lght_to_grid` (reference pipeline/datasets/sevir/sevir.py:304-316,377-448).

Differences (deliberate, for throughput — the reference measured itself
I/O-bound at 61% system time, pipeline/datasets/sevir/test.py:42-72):
  * windowed reads: only the requested T-slice is read from disk instead of
    the full 49-frame event, cutting bytes-read by ~4x for seq_len 13;
  * raw-dtype passthrough: VIL windows can stay uint8 end-to-end and be
    dequantized on the TPU ((x * 1/255) fused into the first conv), shrinking
    host->device transfers by 4x;
  * handles are opened lazily per (worker) process and kept open.
"""

from __future__ import annotations

import os
import threading
from typing import Dict, Optional, Sequence, Union

import h5py
import numpy as np

from .catalog import EventRecord
from .constants import LIGHTNING_FRAME_TIMES, SEVIR_DATA_SHAPE


class SEVIRReader:
    """Keeps HDF5 handles open; reads per-event windows."""

    def __init__(self, data_dir: str, verbose: bool = False):
        self.data_dir = data_dir
        self.verbose = verbose
        self._files: Dict[str, h5py.File] = {}
        self._lock = threading.Lock()

    def _handle(self, fname: str) -> h5py.File:
        f = self._files.get(fname)
        if f is None:
            with self._lock:
                f = self._files.get(fname)
                if f is None:
                    path = os.path.join(self.data_dir, fname)
                    if self.verbose:
                        print("Opening HDF5 file for reading", path)
                    f = h5py.File(path, "r")
                    self._files[fname] = f
        return f

    def close(self) -> None:
        for f in self._files.values():
            f.close()
        self._files = {}

    def read_window(self, event: EventRecord, img_type: str,
                    t_slice: slice = slice(None)) -> np.ndarray:
        """Read (H, W, T_window) for one event/type. Raw dtype preserved."""
        fname = event.files[img_type]
        idx = event.indices[img_type]
        if img_type == "lght":
            pts = self._handle(fname)[idx][:]
            full = lght_to_grid(pts)  # (48, 48, T_all)
            return full[:, :, t_slice]
        ds = self._handle(fname)[img_type]
        if t_slice.stop is not None and t_slice.stop > ds.shape[-1]:
            # h5py silently truncates overflowing slices -> ragged batches
            raise IndexError(
                f"window [{t_slice.start}:{t_slice.stop}] exceeds raw_seq_len "
                f"{ds.shape[-1]} of {fname}; check the dataset's raw_seq_len")
        return ds[idx, :, :, t_slice]

    def read_event(self, event: EventRecord,
                   data_types: Optional[Sequence[str]] = None,
                   t_slice: slice = slice(None)) -> Dict[str, np.ndarray]:
        data_types = data_types or list(event.files)
        return {t: self.read_window(event, t, t_slice) for t in data_types}


def lght_to_grid(data: np.ndarray,
                 frame_times: np.ndarray = LIGHTNING_FRAME_TIMES,
                 grid_shape=SEVIR_DATA_SHAPE["lght"]) -> np.ndarray:
    """Bin an (N, 5) lightning point matrix into (48, 48, T) pixel counts.

    Columns: [t_seconds, _, _, x, y]. Points outside the grid are dropped;
    strikes before the first frame time land in frame 0 (reference
    sevir/sevir.py:408-448 semantics).
    """
    n_t = len(frame_times)
    out_size = (*grid_shape, n_t)
    if data.shape[0] == 0:
        return np.zeros(out_size, dtype=np.int16)

    x, y = data[:, 3], data[:, 4]
    m = (x >= 0) & (x < out_size[0]) & (y >= 0) & (y < out_size[1])
    data = data[m]
    if data.shape[0] == 0:
        return np.zeros(out_size, dtype=np.int16)

    t = data[:, 0]
    z = np.digitize(t, frame_times) - 1
    z[z == -1] = 0  # frame 0 absorbs pre-window strikes

    xi = data[:, 3].astype(np.int64)
    yi = data[:, 4].astype(np.int64)
    k = np.ravel_multi_index(np.array([yi, xi, z]), out_size)
    counts = np.bincount(k, minlength=int(np.prod(out_size)))
    return counts.reshape(out_size).astype(np.int16)
