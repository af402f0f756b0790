"""Device-mesh helpers for observation sharding."""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_obs_mesh", "shard_stacked", "replicate"]


def make_obs_mesh(n_devices=None, devices=None):
    """1-D mesh over an ``obs`` axis.

    Parameters
    ----------
    n_devices : int, optional
        Number of devices to use (default: all available).
    devices : sequence of jax.Device, optional
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_obs_mesh: {n_devices} devices requested but only "
                f"{len(devices)} available ({[str(d) for d in devices]}); "
                "refusing to silently build a smaller mesh. For tests, "
                "force a virtual CPU backend with "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N."
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("obs",))


def shard_stacked(tree, mesh):
    """Place every array of a pytree sharded on its leading (obs) axis."""
    sharding = NamedSharding(mesh, P("obs"))

    def place(leaf):
        if leaf is None:
            return None
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map(place, tree)


def replicate(tree, mesh):
    """Place every array of a pytree replicated across the mesh."""
    sharding = NamedSharding(mesh, P())

    def place(leaf):
        if leaf is None:
            return None
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map(place, tree)
