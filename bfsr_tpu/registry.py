"""Name -> constructor registry with spec-based factories.

Mirrors the reference registry semantics (LINF-LP/models/models.py:7-23 and
LINF-LP/datasets/datasets.py:7-21): components register under a string name,
and ``make(spec)`` builds them from ``{'name': ..., 'args': {...}}`` dicts.
Specs compose recursively (an encoder_spec lives inside a model spec), and a
spec may carry converted parameters under ``'params'`` (the analogue of the
reference's ``'sd'`` state-dict payload) which ``make(load_params=True)``
installs on the built object.

One registry instance serves models, datasets and wrappers; names are
namespaced by convention (the reference keeps two copies of the same 17-line
registry instead).
"""

import copy

_REGISTRY = {}


def register(name):
    """Class/function decorator: register ``cls`` under ``name``."""

    def decorator(cls):
        if name in _REGISTRY and _REGISTRY[name] is not cls:
            raise KeyError(f"duplicate registry name: {name!r}")
        _REGISTRY[name] = cls
        return cls

    return decorator


def lookup(name):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown component {name!r}; known: {sorted(_REGISTRY)}"
        ) from None


def names():
    return sorted(_REGISTRY)


def make(spec, args=None, load_params=False):
    """Build a component from a spec dict.

    ``spec = {'name': str, 'args': dict, ['params': pytree]}``.  ``args``
    overrides/extends spec['args'] (reference: models.py:14-19).  When
    ``load_params`` is true and the spec carries ``'params'``, they are
    installed via the object's ``load_params`` method.
    """
    if args is not None:
        spec_args = copy.deepcopy(spec.get("args", {}) or {})
        spec_args.update(args)
    else:
        spec_args = copy.deepcopy(spec.get("args", {}) or {})
    obj = lookup(spec["name"])(**spec_args)
    if load_params and spec.get("params") is not None:
        obj.load_params(spec["params"])
    return obj
