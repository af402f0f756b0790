"""Pytree registration helper.

The TPU-first architecture passes model objects (NPred models, GMMs,
priors, flux components) directly into ``jax.jit``-ed functions: their
array buffers are pytree *children* (traced), their configuration is
static *aux data* (hashed into the compilation cache key). This helper
registers a class from two attribute lists, so model classes stay plain
Python objects with methods (API parity with the reference) while being
first-class jit/vmap/scan citizens — the functional replacement for the
reference's ``nn.Module``/``register_buffer`` pattern.
"""

import jax

__all__ = ["register_pytree"]


def register_pytree(cls, children_attrs, aux_attrs=(), defaults=None):
    """Register ``cls`` as a JAX pytree node.

    Parameters
    ----------
    children_attrs : sequence of str
        Attributes holding arrays / nested pytrees (traced).
    aux_attrs : sequence of str
        Attributes holding static config. Must be hashable; compared
        for compilation-cache equality.
    defaults : dict, optional
        Attribute values to (re)set on unflattened instances for
        attributes that are neither children nor aux (e.g. host-side
        PRNG state that only exists on the original object).
    """
    children_attrs = tuple(children_attrs)
    aux_attrs = tuple(aux_attrs)
    defaults = dict(defaults or {})

    def flatten(obj):
        children = tuple(getattr(obj, name) for name in children_attrs)
        aux = tuple(getattr(obj, name) for name in aux_attrs)
        return children, aux

    def unflatten(aux, children):
        obj = object.__new__(cls)
        for name, value in zip(children_attrs, children):
            object.__setattr__(obj, name, value)
        for name, value in zip(aux_attrs, aux):
            object.__setattr__(obj, name, value)
        for name, value in defaults.items():
            object.__setattr__(obj, name, value)
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls
