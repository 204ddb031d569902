"""Checkpoint save / restore (orbax) + experiment resume.

Counterpart of the reference's two mechanisms (SURVEY.md §5.4):
  * model checkpoints with module filtering (``training.py:36-246``:
    ``modules_not_to_save`` so frozen submodules are never serialized) —
    here: a key filter over the params pytree, orbax-serialized;
  * experiment resume: the run dir stores the resolved config (json) and
    ``epoch_{E}-step_{S}`` checkpoint naming with retention cleanup
    (``training.py:123-138``).
"""

from __future__ import annotations

import json
import logging
import pathlib
import re
from typing import Optional, Sequence

import jax

LOGGER = logging.getLogger(__name__)

_CKPT_RE = re.compile(r"epoch_(\d+)-step_(\d+)")


def _filter(tree: dict, exclude: Sequence[str]):
    return {k: v for k, v in tree.items() if k not in exclude}


def save_checkpoint(
    ckpt_dir,
    params,
    opt_state=None,
    epoch: int = 0,
    step: int = 0,
    modules_not_to_save: Sequence[str] = (),
    keep: int = -1,
):
    """Save params (+optimizer state) under epoch_{E}-step_{S}.

    modules_not_to_save: top-level param keys to exclude (the reference
    excludes the frozen static/dyn renderers).
    keep: retain only the newest N checkpoints (-1 = all).
    """
    import orbax.checkpoint as ocp

    ckpt_dir = pathlib.Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"epoch_{epoch}-step_{step}"
    payload = {"params": _filter(params, modules_not_to_save)}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if keep > 0:
        clean_up_checkpoints(ckpt_dir, keep)
    return path


def list_checkpoints(ckpt_dir):
    ckpt_dir = pathlib.Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return []
    found = []
    for p in ckpt_dir.iterdir():
        m = _CKPT_RE.fullmatch(p.name)
        if m:
            found.append((int(m.group(1)), int(m.group(2)), p))
    return sorted(found)


def clean_up_checkpoints(ckpt_dir, keep: int):
    """Retention: keep the newest N (reference clean_up_ckpt)."""
    import shutil

    found = list_checkpoints(ckpt_dir)
    for _, _, p in found[:-keep]:
        LOGGER.info("removing old checkpoint %s", p)
        shutil.rmtree(p)


def restore_checkpoint(ckpt_dir, template, epoch: Optional[int] = None):
    """Restore the newest (or a specific-epoch) checkpoint into `template`'s
    structure. Returns (payload, (epoch, step)) or (None, None)."""
    import orbax.checkpoint as ocp

    found = list_checkpoints(ckpt_dir)
    if not found:
        return None, None
    if epoch is not None:
        found = [f for f in found if f[0] == epoch]
        if not found:
            raise FileNotFoundError(f"no checkpoint for epoch {epoch} in {ckpt_dir}")
    e, s, path = found[-1]
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path.absolute(), target=template)
    return payload, (e, s)


def save_run_config(run_dir, cfg_dict: dict):
    """Persist the resolved run configuration (reference saves all.yaml)."""
    run_dir = pathlib.Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    with open(run_dir / "config.json", "w") as f:
        json.dump(cfg_dict, f, indent=2, default=str)


def load_run_config(run_dir):
    p = pathlib.Path(run_dir) / "config.json"
    if not p.exists():
        return None
    with open(p) as f:
        return json.load(f)
