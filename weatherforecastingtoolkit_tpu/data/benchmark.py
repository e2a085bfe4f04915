"""Data-pipeline throughput harness.

The analog of the reference's loader benchmark with recorded conclusions
(reference pipeline/datasets/sevir/test.py:9-73 — ~13.3 batches/s with 8 fork
workers, 61% system time). Measures batches/sec for the HDF5-backed and
cache-backed loaders; run standalone:

    python -m weatherforecastingtoolkit_tpu.data.benchmark --sevir-dir ...
"""

from __future__ import annotations

import argparse
import time

from .cache import CachedSEVIRDataset, build_cache
from .dataset import SEVIRDataset
from .prefetch import BatchLoader


def measure_loader(loader, max_batches: int = 200, warmup: int = 5):
    it = iter(loader)
    for _ in range(warmup):
        next(it, None)
    t0 = time.time()
    n = 0
    seq = 0
    for batch in it:
        n += 1
        seq += next(iter(batch.values())).shape[0]
        if n >= max_batches:
            break
    dt = time.time() - t0
    return n / dt, seq / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sevir-dir", required=True)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seq-len", type=int, default=25)
    p.add_argument("--stride", type=int, default=12)
    p.add_argument("--raw-seq-len", type=int, default=25)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--max-batches", type=int, default=200)
    args = p.parse_args()

    ds = SEVIRDataset(
        catalog=f"{args.sevir_dir}/CATALOG.csv",
        data_dir=f"{args.sevir_dir}/data", data_types=("vil",),
        seq_len=args.seq_len, raw_seq_len=args.raw_seq_len,
        stride=args.stride, layout="NTHWC")
    loader = BatchLoader(ds, args.batch_size, shuffle=True,
                         num_workers=args.num_workers)
    bps, sps = measure_loader(loader, args.max_batches)
    print(f"hdf5 loader:   {bps:7.2f} batches/s  {sps:8.1f} seq/s "
          f"(reference recorded ~13.3 batches/s / ~107 seq/s)")

    if args.cache_dir:
        build_cache(ds, args.cache_dir, split="bench")
        cds = CachedSEVIRDataset(args.cache_dir, split="bench",
                                 seq_len=args.seq_len, stride=args.stride,
                                 layout="NTHWC")
        closer = BatchLoader(cds, args.batch_size, shuffle=True,
                             num_workers=args.num_workers)
        bps2, sps2 = measure_loader(closer, args.max_batches)
        print(f"cached loader: {bps2:7.2f} batches/s  {sps2:8.1f} seq/s "
              f"({bps2 / bps:.1f}x hdf5)")


if __name__ == "__main__":
    main()
