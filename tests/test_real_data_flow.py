"""One-flow real-data rehearsal (VERDICT r3 item 6): every stage of the
real-SEVIR path hands off to the next — download -> preflight -> packed
cache -> train -> metric dict — exercised as ONE flow against the mock S3
server, not as isolated unit stages.

Mirrors the reference's first-contact sequence (sevir.py:930-977: aws-cli
fetch then immediate Dataset construction) that failed on first contact and
motivated the preflight stage. Multi-file vil + lght tree at the REAL
sevirlr geometry (128^2 / 25 frames) so the strict preflight geometry gate
is the one a real tree would face.
"""

import os

import jax
import numpy as np
import pytest

import test_download  # mock public-S3 server (same dir, pytest sys.path)

from weatherforecastingtoolkit_tpu.data.datamodule import SEVIRDataModule
from weatherforecastingtoolkit_tpu.data.download import download_sevir
from weatherforecastingtoolkit_tpu.data.hdf5 import SEVIRReader
from weatherforecastingtoolkit_tpu.data.preflight import preflight
from weatherforecastingtoolkit_tpu.data.synthetic import make_synthetic_sevir
from weatherforecastingtoolkit_tpu.metrics import calc_metrics
from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE
from weatherforecastingtoolkit_tpu.training.tasks import reconstruction_task
from weatherforecastingtoolkit_tpu.training.trainer import Trainer
from weatherforecastingtoolkit_tpu.utils.config import Config


@pytest.fixture()
def s3(tmp_path):
    """A mock public S3 bucket holding a multi-file vil+lght SEVIR tree."""
    origin = str(tmp_path / "origin")
    make_synthetic_sevir(origin, num_events=4, height=128, width=128,
                         raw_seq_len=25, data_types=("vil", "lght"),
                         events_per_file=2)
    objects = {}
    for dirpath, _dirs, files in os.walk(origin):
        for f in files:
            p = os.path.join(dirpath, f)
            objects[os.path.relpath(p, origin).replace(os.sep, "/")] = \
                open(p, "rb").read()
    handler = type("H", (test_download._S3Handler,), {
        "objects": objects, "support_range": True, "hits": []})
    import http.server
    import threading
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", objects
    srv.shutdown()
    srv.server_close()


def test_download_preflight_cache_train_metrics(s3, tmp_path):
    base, objects = s3

    # ---- stage 1: download (CATALOG + both data trees, byte-identical) -----
    root = download_sevir(str(tmp_path / "dl"), data_types=("vil", "lght"),
                          base_url=base)
    for key, body in objects.items():
        local = os.path.join(root, *key.split("/"))
        assert os.path.exists(local), f"download dropped {key}"
        assert open(local, "rb").read() == body, f"download corrupted {key}"

    # ---- stage 2: preflight gates the downloaded tree (strict) -------------
    rep = preflight(root, dataset_name="sevirlr", data_types=("vil", "lght"))
    assert rep.ok, rep.summary()

    # the lght point data the download delivered rasterizes through the
    # reader (the handoff a vil-only rehearsal would never touch)
    from weatherforecastingtoolkit_tpu.data.catalog import build_event_index
    index = build_event_index(os.path.join(root, "CATALOG.csv"),
                              ("vil", "lght"))
    assert len(index) == 4 and all(set(ev.files) == {"vil", "lght"}
                                   for ev in index)
    reader = SEVIRReader(os.path.join(root, "data"))
    grid = reader.read_window(index[0], "lght", slice(0, 25))
    assert grid.shape[-1] == 25 and np.all(grid >= 0)

    # ---- stage 3: datamodule re-preflights + builds the packed cache -------
    dm = SEVIRDataModule(dataset_name="sevirlr", sevir_dir=root, seq_len=13,
                         stride=12, layout="NTCHW", batch_size=2,
                         num_workers=0, use_cache=True, run_preflight=True,
                         train_test_split_date=None)
    dm.prepare_data()
    dm.setup(stage="fit")
    assert len(dm.sevir_train) > 0
    cache_dir = os.path.join(root, "cache_packed")
    assert os.path.isdir(cache_dir) and os.listdir(cache_dir), \
        "packed cache was not built"

    # ---- stage 4: 2-step train on the cached loader -------------------------
    cfg = Config({
        "experiment_name": "real_flow", "experiment_path": str(tmp_path),
        "seed": 0,
        "optim": {"lr": 1e-3, "schedule": "constant"},
        "trainer": {"max_epochs": 1, "total_train_steps": 2,
                    "save_every_n_steps": 1.0},
        "logging": {"log_every_n_steps": 1, "val_every_n": 10.0},
    })
    model = PosAwareAE(enc_channels=(4, 4, 8, 8), dec_channels=(8, 8, 8, 4, 4),
                       num_blocks=1, latent_hw=8, latent_channels=2,
                       latent_dim=32)
    task = reconstruction_task(model, loss="l1")
    tr = Trainer(cfg, task)
    state = tr.fit(dm.train_loader())
    assert int(state.step) == 2
    tr.close()

    # ---- stage 5: trained params -> forward -> full metric dict ------------
    batch = next(iter(dm.train_loader()))
    x = np.asarray(batch["vil"])  # (B, T, C, H, W) in [0, 1]
    b, t = x.shape[:2]
    frames = x.reshape((b * t,) + x.shape[2:])
    recon = np.asarray(model.apply(state.params, frames)[0])
    m = calc_metrics(np.clip(recon.reshape(x.shape), 0, 1), x)
    for k in ("SSIM", "PSNR", "PSNR_ref", "CRPS", "paper_CSI_M_POOL1"):
        assert k in m and np.isfinite(m[k]), (k, m.get(k))
