"""Checkpoint save/restore with corruption-tolerant latest-checkpoint discovery.

Capability parity with the reference's checkpoint stack:
  * periodic + save_last checkpoints into the run dir
    (reference pipeline/helpers.py:237-244 `modelcheckpointcallback`)
  * `find_latest_ckpt`: scan all run dirs, newest first, TRY-RESTORE each and
    skip corrupt ones (reference pipeline/helpers.py:268-301)
  * external torch checkpoint ingestion with key-prefix surgery
    (reference pipeline/helpers.py:14-32 `load_checkpoint_cascast`)

Storage is orbax (async-capable, TPU-native sharded arrays supported); the
run-dir layout mirrors the reference's `outputs/<exp>/runs/run-<id>/checkpoints`.
"""

from __future__ import annotations

import os
import re
import time
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def run_dir_for(experiment_path: str, experiment_name: str, run_id: str) -> str:
    return os.path.join(experiment_path, "outputs", experiment_name, "runs",
                        f"run-{run_id}")


def new_run_id() -> str:
    return f"{int(time.time())}-{os.getpid()}"


class CheckpointManager:
    """Thin orbax wrapper for one run: save(step, state), restore(step|None).

    `async_save=True` makes save() block only for the device->host copy (the
    snapshot is taken at call time); the disk write proceeds on orbax's
    background thread and overlaps the next training steps. Each save first
    drains the previous in-flight write, so at most one write is ever
    outstanding and saves land in order. restore()/close() drain too, so
    readers never see a half-written step from this process (cross-process
    readers are protected by orbax's atomic finalize-rename).
    """

    def __init__(self, run_dir: str, max_to_keep: int = 5,
                 async_save: bool = False):
        self.ckpt_dir = os.path.abspath(os.path.join(run_dir, "checkpoints"))
        self.async_save = async_save
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mgr.wait_until_finished()  # drain any in-flight async write
        if step in self._mgr.all_steps():
            if not force:
                return  # periodic save already wrote this step
            self._mgr.delete(step)  # save_last semantics: overwrite
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        if not self.async_save:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        self._mgr.wait_until_finished()
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"No checkpoints in {self.ckpt_dir}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def all_steps(self):
        return self._mgr.all_steps()

    def metadata(self, step: int):
        """On-disk pytree metadata (shapes/dtypes, no data read) for `step`."""
        return self._mgr.item_metadata(step)

    def is_saving_in_progress(self) -> bool:
        """True while an async save is still writing on the background thread
        (public passthrough so perf probes don't reach into orbax internals)."""
        fn = getattr(self._mgr, "is_saving_in_progress", None)
        if fn is not None:
            return bool(fn())
        return False

    def wait_until_finished(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def _tree_signature(tree: Any) -> set:
    """Normalized key-path set of a pytree, for structural comparison between
    a resume template (TrainState of real arrays or ShapeDtypeStructs) and
    orbax's on-disk metadata (nested dicts). Attribute, dict and sequence
    keys all normalize to their bare name/index so the two shapes of the
    same tree compare equal."""
    paths = set()
    for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]:
        toks = []
        for k in path:
            name = getattr(k, "name", None)
            if name is None:
                name = getattr(k, "key", None)
            if name is None:
                name = getattr(k, "idx", None)
            toks.append(str(name) if name is not None else str(k))
        paths.add("/".join(toks))
    return paths


def find_latest_ckpt(experiment_path: str, experiment_name: str, target: Any,
                     alternates: Tuple = (),
                     ) -> Tuple[Optional[Any], Optional[str], Optional[int]]:
    """Scan every run's checkpoints newest-first; return the first one that
    actually restores: (state, run_id, step). Corrupt checkpoints are skipped
    (the reference's try-load tolerance, pipeline/helpers.py:294-299).

    `alternates` is a sequence of (template, convert_fn) pairs tried on EACH
    candidate after `target` fails, newest candidate first — so a run whose
    newest checkpoint was written under a different-but-convertible state
    shape (e.g. ema_decay toggled mid-run) resumes from that newest step via
    `convert_fn(restored) -> target-shaped state`, instead of silently
    falling back to an older checkpoint that happens to match `target`.
    """
    base = os.path.join(experiment_path, "outputs", experiment_name, "runs")
    if not os.path.isdir(base):
        return None, None, None

    candidates = []  # (mtime, run_id, run_dir, step)
    for d in os.listdir(base):
        m = re.match(r"run-(.+)", d)
        ckpt_root = os.path.join(base, d, "checkpoints")
        if not (m and os.path.isdir(ckpt_root)):
            continue
        for item in os.listdir(ckpt_root):
            step_dir = os.path.join(ckpt_root, item)
            if item.isdigit() and os.path.isdir(step_dir):
                candidates.append((os.path.getmtime(step_dir), m.group(1),
                                   os.path.join(base, d), int(item)))
    candidates.sort(reverse=True)

    templates = [(target, None)] + list(alternates)
    target_sig = _tree_signature(target)
    mismatches = []
    for _, run_id, run_dir, step in candidates:
        try:
            mgr = CheckpointManager(run_dir)
        except Exception as e:  # noqa: BLE001
            print(f"[ckpt] skipping run-{run_id}: unreadable checkpoint dir "
                  f"({type(e).__name__}: {e})")
            continue
        first_err = None
        restored = None
        for tmpl, convert in templates:
            try:
                state = mgr.restore(tmpl, step=step)
                restored = convert(state) if convert is not None else state
                break
            except Exception as e:  # noqa: BLE001 — try the next template
                if first_err is None:
                    first_err = e
        if restored is not None:
            mgr.close()
            return restored, run_id, step
        # Every template failed: distinguish "the saved tree doesn't match
        # the resume template" (a code/config structure change) from genuine
        # corruption — by exception TYPE plus an explicit tree-structure
        # comparison against the on-disk metadata, not message substrings.
        text = f"{type(first_err).__name__}: {first_err}"
        meta_matches = None  # None == metadata unreadable -> corruption
        try:
            meta_matches = _tree_signature(mgr.metadata(step)) == target_sig
        except Exception:  # noqa: BLE001 — metadata unreadable == corruption
            meta_matches = None
        if meta_matches is False:
            structural = True
        elif meta_matches and isinstance(first_err, (ValueError, TypeError)):
            # metadata IS readable and the key paths match, yet restore still
            # refused (shape/dtype change): StandardRestore raises ValueError/
            # TypeError for these; IO-level corruption surfaces as OSError/
            # tensorstore errors. When metadata itself was unreadable the
            # ValueError promotion must NOT apply — that is corruption.
            structural = True
        else:
            structural = False
        mgr.close()
        kind = "TEMPLATE MISMATCH" if structural else "corrupt/unreadable"
        print(f"[ckpt] skipping run-{run_id} step {step}: {kind} "
              f"({text.splitlines()[0][:200]})")
        if structural:
            mismatches.append((run_id, step, text))
    if mismatches:
        print("[ckpt] WARNING: checkpoints exist but NONE match the resume "
              "template — this is a model/optimizer/task structure change, "
              "not corruption. Resuming from scratch would lose "
              f"{len(mismatches)} checkpoint(s); first error:\n"
              f"  {mismatches[0][2].splitlines()[0][:300]}")
    return None, None, None


def strip_prefixes(key: str, prefixes=("module.", "net.")) -> str:
    for p in prefixes:
        if key.startswith(p):
            key = key[len(p):]
    return key


def load_torch_state_dict(path: str, submodel: Optional[str] = None) -> dict:
    """Read a torch checkpoint into {clean_key: np.ndarray}.

    Mirrors `load_checkpoint_cascast` (reference pipeline/helpers.py:14-32):
    optionally select checkpoint['model'][submodel], then strip module./net.
    prefixes. Tensors come back as numpy — conversion to model-specific JAX
    layouts (OIHW->HWIO etc.) is each model family's `from_torch` job.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and submodel is not None and "model" in ckpt:
        ckpt = ckpt["model"][submodel]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    out = {}
    for k, v in ckpt.items():
        out[strip_prefixes(str(k))] = np.asarray(v.detach().cpu().numpy()) \
            if hasattr(v, "detach") else np.asarray(v)
    return out
