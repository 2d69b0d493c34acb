"""Checkpoint / resume for the training demo (orbax-backed).

The reference is a stateless loss library with no checkpointing (SURVEY.md
§5); this covers the training-pipeline side of the framework: save/restore
of (params, opt_state, step) with async-capable orbax, multi-host safe
(orbax coordinates across processes; call on every host)."""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple


__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _manager(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    max_to_keep: int = 3,
) -> None:
    """Save a training checkpoint at ``step``."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, max_to_keep)
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(
    ckpt_dir: str,
    step: Optional[int] = None,
    template: Any = None,
) -> Tuple[int, Any]:
    """Restore (step, state).  ``template`` (a matching pytree of arrays,
    e.g. freshly-initialized params/opt_state) pins dtypes/shardings."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    if template is not None:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    else:
        restored = mgr.restore(step)
    mgr.close()
    return step, restored
