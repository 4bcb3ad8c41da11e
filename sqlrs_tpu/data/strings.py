"""Interning dictionary for VARCHAR columns.

TPU-first string representation: device arrays never hold bytes. Every
distinct string in the engine is interned once into a process-global
dictionary and columns carry its int32 code. Consequences:

- equality (joins, group-by, DISTINCT) is exact integer equality on codes —
  no hash-collision caveat (the reference's hash join matches on hash only,
  TODO at reference src/executor/join/hash_join.rs:221-224; we are exact);
- ordered ops (<, >, MIN/MAX on strings, ORDER BY) go through a cached
  lexicographic-rank projection: rank[code] is computed host-side by sorting
  the dictionary (O(D log D) in the number of *distinct* strings, amortized),
  then the comparison runs on-device on rank arrays;
- rendering gathers codes to host and indexes the dictionary.

Replaces Arrow Utf8 arrays (reference src/types/mod.rs:23, Strings are a
first-class ScalarValue variant there).
"""

from __future__ import annotations

import numpy as np

NULL_CODE = -1  # code used in invalid slots


class StringDictionary:
    def __init__(self) -> None:
        self._codes: dict[str, int] = {}
        self._values: list[str] = []
        self._ranks: np.ndarray | None = None  # lex rank per code, cached

    def __len__(self) -> int:
        return len(self._values)

    def intern(self, s: str) -> int:
        code = self._codes.get(s)
        if code is None:
            code = len(self._values)
            self._codes[s] = code
            self._values.append(s)
            self._ranks = None
        return code

    def intern_many(self, strings) -> np.ndarray:
        """Intern an iterable; None entries get NULL_CODE."""
        out = np.empty(len(strings), dtype=np.int32)
        for i, s in enumerate(strings):
            out[i] = NULL_CODE if s is None else self.intern(s)
        return out

    def lookup(self, code: int) -> str:
        return self._values[code]

    def decode(self, codes: np.ndarray, valid: np.ndarray) -> list[str | None]:
        return [
            self._values[int(c)] if v else None
            for c, v in zip(codes.tolist(), valid.tolist())
        ]

    def ranks(self) -> np.ndarray:
        """rank[code] = position of the string in lexicographic order.

        Monotone in string order, so rank comparison == string comparison.
        Cached until a new string is interned.
        """
        if self._ranks is None or len(self._ranks) != len(self._values):
            order = np.argsort(np.array(self._values, dtype=object), kind="stable")
            ranks = np.empty(len(self._values), dtype=np.int64)
            ranks[order] = np.arange(len(self._values), dtype=np.int64)
            self._ranks = ranks
        return self._ranks


# One dictionary per process: codes are globally comparable, so exchange
# between partitions / hosts needs no dictionary reconciliation on device.
GLOBAL_STRINGS = StringDictionary()
