"""User-facing decorator surface (reference §2.3 D6-D8)."""

from .extension import ExtensionFunc, extension_func
from .attachable import Attachable, attachable, VirtualNamespace

__all__ = [
    "extension_func", "ExtensionFunc",
    "attachable", "Attachable", "VirtualNamespace",
]
