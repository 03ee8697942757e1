"""Attribute-access dict (parity: ``/root/reference/utils/attr.py``)."""
from __future__ import annotations


class AttrDict(dict):
    """dict with attribute access, used for loose model outputs."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        self[key] = value
