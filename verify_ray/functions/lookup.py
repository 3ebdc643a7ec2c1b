"""Shared sorted-array membership lookup.

The broadcast-side idiom used across the engine (canonical selection,
broadcast joins, vocab encode): given a SORTED key array shipped once
via ``ray.put``, find each probe value's position and whether it is
actually present.  Centralized because the ``pos == len`` clamp is a
subtle off-by-one every copy must carry (searchsorted returns len for
probes past the end; clamping to 0 is safe only because the hit mask
re-checks equality).
"""

from __future__ import annotations

import numpy as np


def sorted_lookup(sorted_keys: np.ndarray, probes: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(hit mask, clamped position) of each probe in ``sorted_keys``.
    ``pos`` is only meaningful where ``hit`` is True."""
    if len(sorted_keys) == 0:
        return (np.zeros(len(probes), dtype=bool),
                np.zeros(len(probes), dtype=np.int64))
    pos = np.searchsorted(sorted_keys, probes)
    pos[pos == len(sorted_keys)] = 0
    return sorted_keys[pos] == probes, pos
