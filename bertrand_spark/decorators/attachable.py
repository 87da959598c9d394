"""@attachable — attach engine verbs to pyspark DataFrame at runtime.

Reference: ``bertrand/decorators/attachable.py:47-933`` (attach_to /
namespaces / detach, with the original attribute preserved and
restorable).  The reference attaches to ``pandas.Series``; our host
class is ``pyspark.sql.DataFrame``, giving ``df.cast(...)``,
``df.typecheck(...)`` — or, namespaced, ``df.bertrand.cast(...)`` —
without subclassing or wrapping the DataFrame (plans stay pure
Catalyst; the attachment is driver-side sugar only).
"""

from __future__ import annotations

from functools import wraps
from types import MappingProxyType
from typing import Any, Callable

__all__ = ["attachable", "Attachable", "VirtualNamespace"]


class VirtualNamespace:
    """A descriptor grouping attached methods under one attribute
    (ref attachable.py:326-477: VirtualAttribute/Namespace).

    ``df.bertrand.cast(...)`` — the namespace binds the instance and
    forwards to the registered callables.
    """

    def __init__(self, name: str):
        self._name = name
        self._members: dict[str, Callable] = {}

    def add(self, name: str, fn: Callable) -> None:
        self._members[name] = fn

    def __get__(self, instance: Any, owner: type | None = None):
        ns = self

        class _Bound:
            def __getattr__(self, item: str):
                fn = ns._members.get(item)
                if fn is None:
                    raise AttributeError(
                        f"namespace {ns._name!r} has no attribute {item!r}"
                    )
                if instance is None:
                    return fn
                return lambda *a, **kw: fn(instance, *a, **kw)

            def __dir__(self):
                return list(ns._members)

        return _Bound()


class Attachable:
    """Wrapper recording where a callable has been attached
    (ref attachable.py:76-324)."""

    def __init__(self, func: Callable):
        self._func = func
        # (class, attr_name, original attribute or _MISSING) — a list so one
        # callable can hold several attachments (direct + namespaced)
        self._attached: list[tuple[type, str, Any]] = []
        wraps(func)(self)

    _MISSING = object()

    @property
    def attached(self) -> MappingProxyType:
        return MappingProxyType({cls: name for cls, name, _ in self._attached})

    def attach_to(
        self,
        cls: type,
        name: str | None = None,
        namespace: str | None = None,
        pattern: str = "method",
    ) -> None:
        """Expose the callable on ``cls`` (ref attachable.py:175-324).

        ``pattern``: 'method' (instance passed first) or 'property'.
        ``namespace``: group under ``cls.<namespace>.<name>``.
        The pre-existing attribute, if any, is saved and restored by
        :meth:`detach`.
        """
        attr = name or self._func.__name__
        fn = self._func
        if namespace is not None:
            ns = cls.__dict__.get(namespace)
            if not isinstance(ns, VirtualNamespace):
                original = cls.__dict__.get(namespace, self._MISSING)
                ns = VirtualNamespace(namespace)
                setattr(cls, namespace, ns)
                self._attached.append((cls, namespace, original))
            ns.add(attr, fn)
            return
        original = cls.__dict__.get(attr, self._MISSING)
        if pattern == "property":
            setattr(cls, attr, property(fn))
        elif pattern == "method":
            setattr(cls, attr, fn)
        else:
            raise ValueError(f"unknown pattern {pattern!r}")
        self._attached.append((cls, attr, original))

    def detach(self, cls: type | None = None) -> None:
        """Remove the attachment(s), restoring whatever was there
        (ref attachable.py:477-533)."""
        keep: list[tuple[type, str, Any]] = []
        for c, attr, original in reversed(self._attached):
            if cls is not None and c is not cls:
                keep.append((c, attr, original))
                continue
            if original is self._MISSING:
                try:
                    delattr(c, attr)
                except AttributeError:
                    pass
            else:
                setattr(c, attr, original)
        self._attached = list(reversed(keep))

    def __call__(self, *args: Any, **kwargs: Any):
        return self._func(*args, **kwargs)


def attachable(func: Callable) -> Attachable:
    """Decorator form (ref attachable.py:47)."""
    return Attachable(func)
