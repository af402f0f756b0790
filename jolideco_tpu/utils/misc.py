"""Dict/string helpers (reference ``jolideco/utils/misc.py``)."""

from collections.abc import Mapping

__all__ = ["flatten_dict", "unflatten_dict", "recursive_update", "to_str",
           "format_class_str"]

TABSIZE = 2
MAX_WIDTH = 24


def flatten_dict(d, parent_key="", sep="."):
    """Flatten a nested dict into dotted keys."""
    items = []
    for k, v in d.items():
        new_key = parent_key + sep + k if parent_key else k
        if isinstance(v, Mapping):
            items.extend(flatten_dict(v, new_key, sep=sep).items())
        else:
            items.append((new_key, v))
    return dict(items)


def unflatten_dict(d, sep="."):
    """Invert :func:`flatten_dict`."""
    result = {}
    for key, value in d.items():
        parts = key.split(sep)
        node = result
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return result


def recursive_update(d, u, skip=("asdf_library", "history")):
    """Recursively update dict ``d`` with dict ``u``."""
    for key in reversed(list(u.keys())):
        if key in skip:
            continue
        value = u[key]
        if isinstance(value, Mapping):
            d[key] = recursive_update(d.get(key, {}), value)
        else:
            d[key] = value
    return d


def to_str(data, level=1):
    """Render a (nested) dict for ``__str__`` output."""
    if isinstance(data, dict):
        info = "\n\n"
        for key, value in data.items():
            value = to_str(data=value, level=level + 1)
            indent = level * "\t"
            width = MAX_WIDTH - TABSIZE * level
            info += indent + f"{key:{width}s}: {value}\n"
    elif isinstance(data, float):
        info = f"{data:.3f}"
    else:
        info = str(data)
    return info


def format_class_str(instance):
    """Uniform rich ``__str__`` via an object's ``to_dict``."""
    cls_name = instance.__class__.__name__
    info = cls_name + "\n"
    info += len(cls_name) * "-"
    data = instance.to_dict()
    info += to_str(data=data, level=1)
    return info.expandtabs(tabsize=TABSIZE)
