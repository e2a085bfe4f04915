"""Concurrent packed-cache builds must not race (multi-host ranks share the
filesystem, so with num_shard>1 every rank hits a stale cache at once —
round-2 advisor finding on datamodule.py)."""

import os
import subprocess
import sys

import numpy as np

from weatherforecastingtoolkit_tpu.data.synthetic import make_synthetic_sevir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Builds a 2-shard cached datamodule and prints a digest of rank-local
# samples. The data path is jax-free, so the child never opens a backend.
CHILD = """
import hashlib, os, sys
sys.path.insert(0, {repo!r})
from weatherforecastingtoolkit_tpu.data.datamodule import SEVIRDataModule

dm = SEVIRDataModule(dataset_name="sevirlr", sevir_dir={root!r}, seq_len=13,
                     stride=12, layout="NTCHW", batch_size=2, num_workers=0,
                     use_cache=True, num_shard=2, rank={rank},
                     train_test_split_date=None)
dm.prepare_data()
dm.setup(stage="fit")
h = hashlib.sha256()
ds = dm.sevir_train
for i in range(min(len(ds), 4)):
    h.update(ds[i]["vil"].tobytes())
print("DIGEST", {rank}, h.hexdigest())
"""


def test_concurrent_cache_build_is_single_and_consistent(tmp_path):
    root = str(tmp_path / "sevir")
    make_synthetic_sevir(root, num_events=6, height=32, width=32,
                         raw_seq_len=25)

    procs = [
        subprocess.Popen([sys.executable, "-c",
                          CHILD.format(repo=REPO, root=root, rank=r)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        outs.append(out)

    # exactly one process built; the other waited on the lock
    builds = sum(o.count("[cache] building") for o in outs)
    assert builds == 1, f"expected exactly one cache build, saw {builds}"

    cache_dir = os.path.join(root, "cache_packed")
    leftovers = [f for f in os.listdir(cache_dir) if f.startswith(".")]
    assert not leftovers, f"stale temp/lock files: {leftovers}"
    assert os.path.exists(os.path.join(cache_dir, "train_meta.json"))

    # both ranks served samples (digests printed), deterministically per rank
    digests = {}
    for o in outs:
        for line in o.splitlines():
            if line.startswith("DIGEST"):
                _, r, h = line.split()
                digests[int(r)] = h
    assert set(digests) == {0, 1}


def test_stale_lock_is_stolen(tmp_path):
    root = str(tmp_path / "sevir")
    make_synthetic_sevir(root, num_events=4, height=32, width=32,
                         raw_seq_len=25)
    from weatherforecastingtoolkit_tpu.data.datamodule import SEVIRDataModule

    cache_dir = os.path.join(root, "cache_packed")
    os.makedirs(cache_dir)
    lock = os.path.join(cache_dir, ".train.build_lock")
    with open(lock, "w") as f:
        f.write("99999")
    old = os.path.getmtime(lock) - 7200
    os.utime(lock, (old, old))  # aged 2h: presumed-dead builder

    dm = SEVIRDataModule(dataset_name="sevirlr", sevir_dir=root, seq_len=13,
                         stride=12, layout="NTCHW", batch_size=2,
                         num_workers=0, use_cache=True,
                         train_test_split_date=None)
    dm.prepare_data()
    dm.setup(stage="fit")  # must not deadlock on the stale lock
    assert len(dm.sevir_train) > 0
    assert not os.path.exists(lock)
