"""Training-state checkpointing with optimiser state (orbax-backed).

The reference's per-epoch checkpoints restore model state only — there
is no optimizer-state checkpointing and no resume-training path
(reference ``core.py:234-247``, SURVEY.md §5). Here the full train
state ``(params, opt_state, PRNG key, epoch)`` round-trips through an
orbax PyTree checkpoint, so training genuinely resumes.

Cross-topology contract: the state is converted to host numpy before
writing and restored as host numpy (explicit ``RestoreArgs``, no
device-sharding metadata needed), so a checkpoint saved from an
8-chip mesh run restores onto 1 chip and vice versa — the natural TPU
workflow (train big, resume/analyse small). The resumed run's jit
placement re-shards the arrays for whatever mesh it is given; the
trained parameters themselves are replicated in every configuration,
so no information is lost either way. This also removes orbax's
"Sharding info not provided … unsafe when restoring on a different
topology" warning, which the pre-round-5 device-array restore hit.
Pinned by ``tests/test_resume_and_cli.py`` (mesh→single and
single→mesh resume).
"""

import logging
from pathlib import Path

import numpy as np

import jax

log = logging.getLogger(__name__)

__all__ = ["save_train_state", "restore_train_state"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(path, params, opt_state, key, epoch):
    """Save the full train state to ``path`` (a directory).

    Device arrays (including mesh-sharded ones) are fetched to host
    numpy first — the checkpoint is topology-agnostic by construction.
    """
    path = Path(path).absolute()
    state = {
        "params": params,
        "opt_state": opt_state,
        "key": key,
        "epoch": np.int64(epoch),
    }
    state = jax.device_get(state)
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    log.info(f"Saved train state to {path}")


def restore_train_state(path, params_template, opt_state_template,
                        key_template):
    """Restore a train state saved by :func:`save_train_state`.

    Templates (freshly initialised pytrees of the right structure)
    drive the typed restore. Arrays come back as HOST numpy regardless
    of the topology they were saved on or the current device set; the
    caller's jit placement moves them to whatever mesh the resumed run
    uses.

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
    # host-numpy restore: no device placement, no sharding metadata —
    # the one valid answer on every topology
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), template
    )
    ckptr = _checkpointer()
    restored = ckptr.restore(
        path,
        args=ocp.args.PyTreeRestore(item=template,
                                    restore_args=restore_args),
    )
    log.info(f"Restored train state from {path}")
    return (
        restored["params"],
        restored["opt_state"],
        restored["key"],
        int(restored["epoch"]),
    )
