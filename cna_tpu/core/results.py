"""Result containers.

The reference returns ``argparse.Namespace`` grab-bags (``_nam.py:168``,
``_association.py:129``).  ``Result`` keeps that ergonomic attribute-style
access (so user code ported from the reference keeps working) while
supporting dict-style construction/update and a readable repr.
"""

from __future__ import annotations

from types import SimpleNamespace


class Result(SimpleNamespace):
    """Attribute-style result namespace (drop-in for argparse.Namespace)."""

    def update(self, other) -> None:
        if isinstance(other, SimpleNamespace):
            other = vars(other)
        self.__dict__.update(other)

    def keys(self):
        return self.__dict__.keys()

    def __getitem__(self, key):
        return self.__dict__[key]

    def __contains__(self, key):
        return key in self.__dict__

    def __repr__(self):
        keys = ", ".join(sorted(k for k in self.__dict__ if not k.startswith("_")))
        return f"Result({keys})"
