"""Error-message helpers (reference parity: ``bertrand/util/error.py``).

Engine errors that embed collections (candidate aliases, overload tables,
offending values) abridge them through :func:`shorten_list` so a
million-entry registry never dumps itself into a traceback.
"""

from __future__ import annotations

from typing import Iterable


def shorten_list(seq: Iterable, max_items: int = 5) -> str:
    """Abridge a sequence for an error message.

    Short sequences render in full; longer ones show the first
    ``max_items`` followed by an ellipsis and the total count — the same
    convention as the reference's ``shorten_list`` (util/error.py), so
    messages stay recognizable to users coming from it.
    """
    items = list(seq)
    if len(items) <= max_items:
        return str(items)
    head = ", ".join(str(i) for i in items[:max_items])
    return f"[{head}, ...] ({len(items)})"
