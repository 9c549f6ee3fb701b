"""Access-mode errors and warnings mirroring the reference semantics.

The reference enforces a strict read/write asymmetry: read-side mappings
raise ``ReadOnlyError`` on mutation (``/root/reference/heparchy/read/hdf.py:49-53``)
and write-side property getters raise ``WriteOnlyError``
(``/root/reference/heparchy/write/hdf.py:51-58``); overwriting an existing
dataset warns with ``OverwriteWarning`` (``write/hdf.py:57-60,75-77``).
"""

from __future__ import annotations

__all__ = ["ReadOnlyError", "WriteOnlyError", "OverwriteWarning"]


class ReadOnlyError(RuntimeError):
    """Raised when mutating data via a read-only interface."""


class WriteOnlyError(RuntimeError):
    """Raised when reading data via a write-only interface."""


class OverwriteWarning(RuntimeWarning):
    """Warns when existing data is about to be overwritten."""
