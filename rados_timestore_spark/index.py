"""Epoch index: ordered map Epoch -> bucket count.

Reference: ``newtype Index = Map Epoch Bucket``
(lib/TimeStore/Index.hs:37).  The index says "points with
``time >= epoch_i`` (and ``< epoch_{i+1}``) are hashed over
``count_i`` buckets"; bucket counts may change at each rollover
(lib/TimeStore/StoreHelpers.hs:194-221).

In Spark the index is tiny driver-side metadata (a handful of
entries).  Epoch assignment compiles to a chained ``CASE WHEN``
literal expression — JVM-side, whole-stage-codegen'd, no join and no
shuffle — rather than a lookup join; Catalyst constant-folds it into
the scan's partition filter when reading.

* stab lookup (greatest epoch <= t, leftmost if t precedes all):
  ``lib/TimeStore/Index.hs:71-88``.
* range lookup (all epochs overlapping [start, end]):
  ``lib/TimeStore/Index.hs:91-95``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Index:
    """Sorted (epoch, n_buckets) entries; epochs strictly increasing."""

    entries: tuple[tuple[int, int], ...] = field(default_factory=tuple)

    def __post_init__(self):
        ordered = tuple(sorted((int(e), int(b)) for e, b in self.entries))
        if not ordered:
            raise ValueError("index must have at least one entry")
        if len({e for e, _ in ordered}) != len(ordered):
            raise ValueError("duplicate epochs in index")
        object.__setattr__(self, "entries", ordered)

    # -- driver-side lookups (planning) --------------------------------

    def stab(self, t: int) -> tuple[int, int]:
        """Greatest entry with epoch <= t; leftmost entry if t precedes
        all epochs (Index.hs:71-88 ``indexLookup``/``splitRemainder``)."""
        best = self.entries[0]
        for e, b in self.entries:
            if e <= t:
                best = (e, b)
            else:
                break
        return best

    def range_lookup(self, start: int, end: int) -> list[tuple[int, int]]:
        """Entries overlapping [start, end]: the stab entry for start
        plus every entry with start-epoch < e <= end (Index.hs:91-95)."""
        stab = self.stab(start)
        return [stab] + [(e, b) for e, b in self.entries if stab[0] < e <= end]

    def latest(self) -> tuple[int, int]:
        return self.entries[-1]

    # -- column expressions (execution) --------------------------------

    def epoch_col(self, time: Column | str = "time") -> Column:
        """Epoch assignment as a literal CASE chain (stab semantics)."""
        time = F.col(time) if isinstance(time, str) else time
        # Descending scan: first epoch <= t wins; fall back to the
        # leftmost epoch for t before all entries.
        expr = F.lit(self.entries[0][0])
        for e, _ in self.entries:  # ascending: later conditions override
            expr = F.when(time >= F.lit(e), F.lit(e)).otherwise(expr)
        return expr

    def bucket_count_col(self, time: Column | str = "time") -> Column:
        time = F.col(time) if isinstance(time, str) else time
        expr = F.lit(self.entries[0][1])
        for e, b in self.entries:
            expr = F.when(time >= F.lit(e), F.lit(b)).otherwise(expr)
        return expr

    # -- (de)serialization ---------------------------------------------

    def to_json(self) -> list[list[int]]:
        return [[e, b] for e, b in self.entries]

    @classmethod
    def from_json(cls, data) -> "Index":
        return cls(tuple((int(e), int(b)) for e, b in data))
