"""Checkpoint save/restore via Orbax.

Behavioral parity with the reference (/root/reference/nerf/utils.py:50-63,
train.py:143-149): a checkpoint stores ``{step, model_type, params,
opt_state}`` under ``{save_path}/{model_type}_model_{step:06d}``; the
``model_type`` is self-describing and takes precedence over config on resume
(train.py:67-69), and resume restores the optimizer state and step. The LR
schedule is a pure function of step, so the reference's "scheduler state" is
just the step counter.

Orbax handles sharded arrays natively, so the same path works single-chip
and across a multi-host mesh (process 0 coordinates, all hosts participate).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax

_CKPT_RE = re.compile(r"^(?P<model>[a-z0-9_]+)_model_(?P<step>\d{6,})$")


def _state_dir(save_path: str, model_type: str, step: int) -> str:
    return os.path.join(os.path.abspath(save_path), f"{model_type}_model_{step:06d}")


def save_checkpoint(
    state: Any, save_path: str, model_type: str, step: int,
    extra: dict | None = None,
) -> str:
    """Save a train-state pytree; returns the checkpoint directory."""
    import orbax.checkpoint as ocp

    path = _state_dir(save_path, model_type, step)
    with ocp.StandardCheckpointer() as cp:
        cp.save(path, jax.tree.map(lambda x: x, state), force=True)
    _write_meta(path, model_type, step, extra)
    return path


def read_metadata(path: str) -> dict:
    path = os.path.abspath(path)
    # Async saves write the meta NEXT to the dir at dispatch time; the dir
    # itself only appears when Orbax's background commit completes. A crash
    # mid-save can therefore leave an orphaned meta file — require the
    # committed checkpoint directory before trusting the metadata.
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"no committed checkpoint at {path} (an orphaned .meta.json from "
            "an interrupted async save does not count)"
        )
    for p in (path + ".meta.json", os.path.join(path, "nerf_tpu_meta.json")):
        if os.path.exists(p):
            with open(p, "r") as f:
                return json.load(f)
    raise FileNotFoundError(f"no checkpoint metadata for {path}")


def _write_meta(path: str, model_type: str, step: int,
                extra: dict | None = None) -> None:
    if jax.process_index() != 0:
        return  # Orbax saves are collective; the meta sidecar is process-0's
    meta = {"step": int(step), "model_type": model_type}
    if extra:
        meta.update(extra)  # e.g. grid_res after a coarse-to-fine upsample
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


class AsyncCheckpointSaver:
    """Background checkpointing: ``save`` dispatches the device->host copy
    and returns; serialization and the atomic directory commit happen on
    Orbax's background thread while training continues (the reference blocks
    the loop on ``torch.save``, utils.py:50-63). Call ``wait`` before
    process exit (final/SIGINT saves) to guarantee durability.
    """

    def __init__(self):
        import orbax.checkpoint as ocp

        self._cp = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, state: Any, save_path: str, model_type: str, step: int,
             extra: dict | None = None) -> str:
        import orbax.checkpoint as ocp

        path = _state_dir(save_path, model_type, step)
        # a second save while one is in flight waits for the first commit
        self._cp.save(
            path, args=ocp.args.StandardSave(jax.tree.map(lambda x: x, state)),
            force=True,
        )
        _write_meta(path, model_type, step, extra)
        return path

    def wait(self) -> None:
        self._cp.wait_until_finished()

    def close(self) -> None:
        self._cp.close()


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by ``save_checkpoint``. ``template`` is a
    pytree of arrays or ShapeDtypeStructs with the target structure (and
    shardings, when restoring onto a mesh)."""
    import orbax.checkpoint as ocp

    abstract = jax.tree.map(
        lambda x: x
        if isinstance(x, jax.ShapeDtypeStruct)
        else ocp.utils.to_shape_dtype_struct(x),
        template,
    )
    with ocp.StandardCheckpointer() as cp:
        return cp.restore(os.path.abspath(path), abstract)


def latest_checkpoint(save_path: str, model_type: Optional[str] = None) -> Optional[str]:
    """Most recent checkpoint dir under ``save_path`` (optionally filtered by
    model type), or None."""
    save_path = os.path.abspath(save_path)
    if not os.path.isdir(save_path):
        return None
    best: tuple[int, str] | None = None
    for name in os.listdir(save_path):
        m = _CKPT_RE.match(name)
        if not m:
            continue
        if model_type is not None and m.group("model") != model_type:
            continue
        step = int(m.group("step"))
        if best is None or step > best[0]:
            best = (step, name)
    return os.path.join(save_path, best[1]) if best else None
