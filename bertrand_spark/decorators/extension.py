"""@extension_func — managed, validated, thread-local keyword defaults.

Reference: ``bertrand/decorators/extension.py:20-476``.  The reference
wraps a function so that extra keyword arguments can be *registered* at
runtime with validators and overridable defaults; default overrides are
thread-local (each thread sees its own settings; ``ExtensionFunc``
subclasses ``threading.local`` there, and here).

This matters for a Spark engine because plan-building happens on the
driver, possibly from many threads (e.g. concurrent streaming queries):
``cast.tol = 1e-9`` in one thread must not perturb plans built in
another.
"""

from __future__ import annotations

import threading
from functools import wraps
from types import MappingProxyType
from typing import Any, Callable

__all__ = ["extension_func", "ExtensionFunc"]


class ExtensionFunc:
    """Callable wrapper with runtime-managed keyword arguments.

    * ``@func.argument(default=...)`` registers a validated kwarg
      (ref extension.py:182-265);
    * ``func.<name> = value`` overrides the default **in this thread
      only** (ref: ExtensionFunc subclasses threading.local);
    * ``del func.<name>`` / ``func.reset_defaults()`` restore
      (ref extension.py:309-399).
    """

    def __init__(self, func: Callable):
        # bypass our own __setattr__ for internals
        object.__setattr__(self, "_func", func)
        object.__setattr__(self, "_validators", {})
        object.__setattr__(self, "_defaults", {})
        object.__setattr__(self, "_local", threading.local())
        wraps(func)(self)

    # -- registration (ref extension.py:182) --------------------------------
    def argument(self, default: Any = None, name: str | None = None):
        """Register a managed argument; the decorated callable validates."""

        def decorator(validator: Callable) -> Callable:
            key = name or validator.__name__
            self._validators[key] = validator
            self._defaults[key] = default
            return validator

        return decorator

    def remove_arg(self, name: str) -> None:
        self._validators.pop(name, None)
        self._defaults.pop(name, None)
        if hasattr(self._local, "overrides"):
            self._local.overrides.pop(name, None)

    def reset_defaults(self) -> None:
        if hasattr(self._local, "overrides"):
            self._local.overrides.clear()

    @property
    def arguments(self) -> MappingProxyType:
        return MappingProxyType(self._validators)

    @property
    def settings(self) -> MappingProxyType:
        merged = dict(self._defaults)
        merged.update(getattr(self._local, "overrides", {}))
        return MappingProxyType(merged)

    # -- thread-local overrides via attribute access -------------------------
    def __getattr__(self, name: str):
        defaults = object.__getattribute__(self, "_defaults")
        if name in defaults:
            local = object.__getattribute__(self, "_local")
            return getattr(local, "overrides", {}).get(name, defaults[name])
        raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        if name in self._defaults:
            validated = self._validators[name](value)
            if not hasattr(self._local, "overrides"):
                self._local.overrides = {}
            self._local.overrides[name] = (
                value if validated is None else validated
            )
            return
        object.__setattr__(self, name, value)

    def __delattr__(self, name: str) -> None:
        if name in self._defaults:
            if hasattr(self._local, "overrides"):
                self._local.overrides.pop(name, None)
            return
        object.__delattr__(self, name)

    # -- call ---------------------------------------------------------------
    def __call__(self, *args: Any, **kwargs: Any):
        merged = dict(self.settings)
        for k, v in kwargs.items():
            if k in self._validators:
                validated = self._validators[k](v)
                merged[k] = v if validated is None else validated
            else:
                merged[k] = v
        return self._func(*args, **merged)

    def __repr__(self) -> str:
        return f"ExtensionFunc({self._func.__name__}, settings={dict(self.settings)})"


def extension_func(func: Callable) -> ExtensionFunc:
    """Decorator form (ref extension.py:20)."""
    return ExtensionFunc(func)
