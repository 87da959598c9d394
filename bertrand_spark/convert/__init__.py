"""Conversion engine: cast matrix, dispatch, decorators, object escape hatch."""

from . import objects as _objects  # noqa: F401 — registers object↔any rules
from .cast import CastArgs, CastError, cast, cast_col, cast_overload

__all__ = ["cast", "cast_col", "cast_overload", "CastArgs", "CastError"]
