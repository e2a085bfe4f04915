"""Multi-host execution, exercised for real: two OS processes under
jax.distributed (Gloo CPU collectives), each feeding its OWN event shard
through the auto-sharded SEVIRDataModule into one global DP train step.
The replicated post-step params must match a single-process run on the
concatenated data (the `strategy="auto"` + shard-aware-loader analog,
SURVEY §2.5; shard semantics reference sevir/sevir.py:161-172,346-375)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.data.synthetic import make_synthetic_sevir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
# the pytest parent exports --xla_force_host_platform_device_count=8; each
# child host must have exactly ONE local device (true multi-host topology)
os.environ["XLA_FLAGS"] = " ".join(
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "host_platform_device_count" not in f)
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address={coord!r}, num_processes=2,
                           process_id={rank})
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# the DataModule must pick up num_shard/rank from jax.distributed by itself
from weatherforecastingtoolkit_tpu.data.datamodule import SEVIRDataModule
from tests.multihost_model import make_step, N_LOCAL

dm = SEVIRDataModule(dataset_name="sevirlr", sevir_dir={root!r}, seq_len=4,
                     stride=25, layout="NTCHW", batch_size=N_LOCAL,
                     num_workers=0, shuffle_train=False, val_ratio=0.0,
                     train_test_split_date=None)
assert dm.num_shard == 2 and dm.rank == {rank}, (dm.num_shard, dm.rank)
dm.prepare_data(); dm.setup(stage="fit")
local = next(iter(dm.train_loader()))["vil"].astype(np.float32)  # whole shard
assert local.shape[0] == N_LOCAL, local.shape

mesh = Mesh(np.array(jax.devices()), ("dp",))
step, params0, tx_state0 = make_step(mesh)
garr = jax.make_array_from_single_device_arrays(
    (2 * N_LOCAL,) + local.shape[1:], NamedSharding(mesh, P("dp")),
    [jax.device_put(local, jax.local_devices()[0])])
params1, loss = step(params0, tx_state0, garr)
flat = jax.tree_util.tree_leaves(jax.device_get(params1))
np.savez({out_path!r}, loss=np.asarray(loss),
         **{{f"p{{i}}": np.asarray(a) for i, a in enumerate(flat)}})
print("RANK", {rank}, "loss", float(loss), flush=True)
"""


CHILD_FSDP = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = " ".join(
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "host_platform_device_count" not in f)
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address={coord!r}, num_processes=2,
                           process_id={rank})
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tests.multihost_model import make_fsdp_step, N_LOCAL

mesh = Mesh(np.array(jax.devices()), ("dp",))  # 2 global devs, 1 per process
step, params0, opt0 = make_fsdp_step(mesh)
rng = np.random.default_rng(0)
full = rng.random((2 * N_LOCAL, 4, 1, 32, 32)).astype(np.float32)
local = full[{rank} * N_LOCAL:({rank} + 1) * N_LOCAL]
garr = jax.make_array_from_single_device_arrays(
    full.shape, NamedSharding(mesh, P("dp")),
    [jax.device_put(local, jax.local_devices()[0])])
params1, loss = step(params0, opt0, garr)
# each process persists only ITS OWN addressable shard of every leaf —
# the whole point: no process ever holds the full parameter state
payload = {{"loss": np.asarray(loss)}}
for i, leaf in enumerate(jax.tree_util.tree_leaves(params1)):
    spec = tuple(leaf.sharding.spec)
    payload[f"p{{i}}"] = np.asarray(leaf.addressable_shards[0].data)
    payload[f"dim{{i}}"] = np.asarray(spec.index("dp") if "dp" in spec else -1)
np.savez({out_path!r}, **payload)
print("RANK", {rank}, "loss", float(loss), flush=True)

# -- multi-host sharded checkpoint: every process writes ITS shards, orbax
# coordinates the barrier/finalize; restore comes back with the same
# sharding and values (checked against the in-memory post-step tree)
from weatherforecastingtoolkit_tpu.training.checkpoint import CheckpointManager

mgr = CheckpointManager({ckpt_dir!r}, async_save=True)
mgr.save(1, params1)
mgr.wait_until_finished()
restored = mgr.restore(jax.tree_util.tree_map(
    lambda leaf: jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                      sharding=leaf.sharding), params1))
for a, b in zip(jax.tree_util.tree_leaves(params1),
                jax.tree_util.tree_leaves(restored)):
    assert a.sharding == b.sharding, (a.sharding, b.sharding)
    np.testing.assert_array_equal(np.asarray(a.addressable_shards[0].data),
                                  np.asarray(b.addressable_shards[0].data))
mgr.close()
print("RANK", {rank}, "SHARDED_CKPT_OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_step_matches_single_process(tmp_path):
    root = str(tmp_path / "sevir")
    # 8 events x 1 window (stride 25 = raw_seq_len) = 8 windows; 4 per shard
    make_synthetic_sevir(root, num_events=8, height=32, width=32,
                         raw_seq_len=25)
    coord = f"localhost:{_free_port()}"

    procs, outs = [], []
    for r in range(2):
        out_path = str(tmp_path / f"rank{r}.npz")
        outs.append(out_path)
        code = CHILD.format(repo=REPO, coord=coord, rank=r, root=root,
                            out_path=out_path)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True, cwd=REPO))
    for p in procs:
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, f"child failed:\n{out[-4000:]}"
        assert "auto-sharding events" in out

    # replicated params: both ranks must hold identical post-step params
    a = np.load(outs[0])
    b = np.load(outs[1])
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k])

    # single-process ground truth on the CONCATENATED batch (uneven split is
    # contiguous: shard 0 events then shard 1, same catalog order)
    import jax
    import numpy as _np
    from jax.sharding import Mesh

    from tests.multihost_model import N_LOCAL, make_step
    from weatherforecastingtoolkit_tpu.data.datamodule import SEVIRDataModule

    dm = SEVIRDataModule(dataset_name="sevirlr", sevir_dir=root, seq_len=4,
                         stride=25, layout="NTCHW", batch_size=2 * N_LOCAL,
                         num_workers=0, shuffle_train=False, val_ratio=0.0,
                         train_test_split_date=None)
    dm.prepare_data(); dm.setup(stage="fit")
    full = next(iter(dm.train_loader()))["vil"].astype(_np.float32)
    assert full.shape[0] == 2 * N_LOCAL
    mesh = Mesh(_np.array(jax.devices()[:1]), ("dp",))
    step, params0, tx_state0 = make_step(mesh)
    params1, loss = step(params0, tx_state0, jax.device_put(full))
    ref = jax.tree_util.tree_leaves(jax.device_get(params1))
    got = [a[f"p{i}"] for i in range(len(ref))]
    for i, (g, r) in enumerate(zip(got, ref)):
        _np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-6,
                                    err_msg=f"leaf {i}")
    assert float(a["loss"]) == pytest.approx(float(loss), rel=2e-5)


def test_two_process_fsdp_step_matches_single_process(tmp_path):
    """FSDP across REAL process boundaries: params + optimizer state are
    SPLIT over two jax.distributed processes (one device each, Gloo
    collectives); neither process ever holds the full state. Reassembling
    the two post-step param shards must reproduce a plain single-device
    step from the same init."""
    coord = f"localhost:{_free_port()}"
    ckpt_dir = str(tmp_path / "shared_ckpt")  # one dir, both ranks write
    procs, outs = [], []
    for r in range(2):
        out_path = str(tmp_path / f"fsdp_rank{r}.npz")
        outs.append(out_path)
        code = CHILD_FSDP.format(repo=REPO, coord=coord, rank=r,
                                 out_path=out_path, ckpt_dir=ckpt_dir)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True, cwd=REPO))
    child_logs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        child_logs.append(out)
        assert p.returncode == 0, f"fsdp child failed:\n{out[-4000:]}"
        assert "SHARDED_CKPT_OK" in out, (
            f"multi-host sharded checkpoint failed:\n{out[-4000:]}")

    a = np.load(outs[0])
    b = np.load(outs[1])
    assert float(a["loss"]) == pytest.approx(float(b["loss"]), rel=1e-6)

    # ground truth: plain single-device step, same init/batch
    import jax
    import numpy as _np
    from jax.sharding import Mesh

    from tests.multihost_model import N_LOCAL, make_step

    full = _np.random.default_rng(0).random(
        (2 * N_LOCAL, 4, 1, 32, 32)).astype(_np.float32)
    mesh = Mesh(_np.array(jax.devices()[:1]), ("dp",))
    step, params0, opt0 = make_step(mesh)
    params1, loss = step(params0, opt0, jax.device_put(full))
    ref = jax.tree_util.tree_leaves(jax.device_get(params1))

    sharded_leaves = 0
    for i, r_leaf in enumerate(ref):
        dim = int(a[f"dim{i}"])
        if dim < 0:  # replicated leaf: both ranks hold the full copy
            _np.testing.assert_array_equal(a[f"p{i}"], b[f"p{i}"])
            got = a[f"p{i}"]
        else:  # split leaf: neither rank holds it all — reassemble
            assert a[f"p{i}"].shape[dim] == r_leaf.shape[dim] // 2
            got = _np.concatenate([a[f"p{i}"], b[f"p{i}"]], axis=dim)
            sharded_leaves += 1
        _np.testing.assert_allclose(got, r_leaf, rtol=2e-5, atol=2e-6,
                                    err_msg=f"leaf {i}")
    assert sharded_leaves >= 2  # the conv kernels really were split
    assert float(a["loss"]) == pytest.approx(float(loss), rel=2e-5)
