"""Training-state checkpointing with optimiser state (orbax-backed).

The reference's per-epoch checkpoints restore model state only — there
is no optimizer-state checkpointing and no resume-training path
(reference ``core.py:234-247``, SURVEY.md §5). Here the full train
state ``(params, opt_state, PRNG key, epoch)`` round-trips through an
orbax PyTree checkpoint, so training genuinely resumes.
"""

import logging
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

__all__ = ["save_train_state", "restore_train_state"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(path, params, opt_state, key, epoch):
    """Save the full train state to ``path`` (a directory)."""
    path = Path(path).absolute()
    state = {
        "params": params,
        "opt_state": opt_state,
        "key": key,
        "epoch": np.int64(epoch),
    }
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    log.info(f"Saved train state to {path}")


def restore_train_state(path, params_template, opt_state_template,
                        key_template):
    """Restore a train state saved by :func:`save_train_state`.

    Templates (freshly initialised pytrees of the right structure)
    drive the typed restore.

    Returns
    -------
    (params, opt_state, key, epoch)
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    template = {
        "params": params_template,
        "opt_state": opt_state_template,
        "key": key_template,
        "epoch": np.int64(0),
    }
    ckptr = _checkpointer()
    restored = ckptr.restore(
        path, args=ocp.args.PyTreeRestore(item=template)
    )
    log.info(f"Restored train state from {path}")
    return (
        restored["params"],
        restored["opt_state"],
        restored["key"],
        int(restored["epoch"]),
    )
