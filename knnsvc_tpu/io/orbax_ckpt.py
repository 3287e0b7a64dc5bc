"""Orbax checkpointing (SURVEY.md §5: 'TPU equivalent: orbax checkpoints').

Optional alternative to the pickle pytrees: async-capable, multi-host-safe
checkpoints of full TrainState (params + optimizer state + step), with the
same best-only retention policy the reference uses (keep 1, delete previous —
ref hifigan/ddsp_train.py:344-372) expressed through orbax's CheckpointManager.
"""

from __future__ import annotations

from typing import Any


def save_train_state(directory: str, step: int, state: Any, keep: int = 1,
                     epoch: int = 0) -> None:
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(
        directory, options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    ) as mngr:
        # epoch rides along like the pickle do_ checkpoint's (ref
        # ddsp_train.py:352-367) so resume restarts at the right epoch
        mngr.save(step, args=ocp.args.StandardSave(
            {"state": state, "epoch": int(epoch)}))
        mngr.wait_until_finished()


def restore_train_state(directory: str, template: Any,
                        step: int | None = None) -> tuple[Any, int, int]:
    """Restore the latest (or given) step into the structure of `template`.
    Returns (state, step, epoch)."""
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(directory) as mngr:
        step = mngr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoints under {directory}")
        # choose the layout from the checkpoint's own structure rather than
        # retrying on broad exception types: a genuine template/shape
        # mismatch on a new-layout checkpoint must surface as itself, not as
        # an unrelated secondary error from a bare-state retry (ADVICE r3)
        try:
            meta = mngr.item_metadata(step)
            tree = getattr(meta, "item_metadata", meta)
            if tree is None:
                # orbax >= 0.11: the manager cannot infer a handler without a
                # registry and returns None — read the item's own tree
                # metadata directly instead
                import os as _os

                item_dir = _os.path.join(str(directory), str(step), "default")
                m2 = ocp.StandardCheckpointer().metadata(item_dir)
                tree = getattr(m2, "item_metadata", m2)
            tree = getattr(tree, "tree", tree)  # TreeMetadata -> plain dict
            has_epoch = isinstance(tree, dict) and "epoch" in tree \
                and "state" in tree
        except Exception:
            # metadata unreadable (very old orbax layouts) — assume current
            has_epoch = True
        if has_epoch:
            payload = mngr.restore(step, args=ocp.args.StandardRestore(
                {"state": template, "epoch": 0}))
            return payload["state"], step, int(payload["epoch"])
        # legacy layout (pre-epoch): the checkpoint IS the bare state
        state = mngr.restore(step, args=ocp.args.StandardRestore(template))
        return state, step, 0
