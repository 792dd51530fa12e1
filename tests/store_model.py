"""Pure-Python executable MODEL of the store semantics (no Spark).

The Spark-backed Hypothesis suites (test_properties.py) run few,
adversarial examples because every example pays Spark job latency;
this model lets the store LAWS run at the reference's QuickCheck scale
(FuzzyTests.hs:150-243 — hundreds of cases) in milliseconds
(test_pure_properties.py), with one Spark agreement check pinning the
model to the real engine.

Semantics mirrored from rados_timestore_spark.store.TimeStore /
mutable.MutableKV (the law-relevant subset):

* a namespace is an append-only point log; ``seq`` is honored when
  given, else stamped densely above every previous batch;
* addresses: bit 0 clear = simple (value), set = extended (payload);
* reads are closed-interval [start, end] on the REQUESTED addresses
  (empty request => empty result; read_extended forces bit 0 on its
  requests, read_simple drops odd requests), first-wins dedup on
  (address, time) = the MIN-seq row;
* latest(ns) = per-kind monotone watermark of max written time;
* latest_per_key = per-address (time DESC, seq ASC) winner;
* MutableKV: key | 1, Time reused as version, insert_with merge(new,
  old) at version + 1, enumerate = latest value per key.
"""

from __future__ import annotations

from typing import Callable


class NamespaceNotRegistered(KeyError):
    pass


class PureStore:
    def __init__(self) -> None:
        #: ns -> list of (address, time, value, payload, seq)
        self._log: dict[str, list[tuple]] = {}
        self._seq_base: dict[str, int] = {}
        self._latest: dict[str, tuple[int | None, int | None]] = {}

    # ------------------------------------------------------- lifecycle

    def register_namespace(self, ns: str) -> None:
        self._log.setdefault(ns, [])
        self._seq_base.setdefault(ns, 0)
        self._latest.setdefault(ns, (None, None))

    def is_registered(self, ns: str) -> bool:
        return ns in self._log

    def _require(self, ns: str) -> None:
        if ns not in self._log:
            raise NamespaceNotRegistered(ns)

    # ----------------------------------------------------------- write

    def write_points(self, ns: str, rows: list[tuple]) -> None:
        """rows: (address, time, value, payload) or (..., seq)."""
        self._require(ns)
        log = self._log[ns]
        ms, me = self._latest[ns]
        base = self._seq_base[ns]
        for i, row in enumerate(rows):
            if len(row) == 5:
                a, t, v, p, s = row
            else:
                a, t, v, p = row
                s = base + i
            log.append((a, t, v, p, s))
            self._seq_base[ns] = max(self._seq_base[ns], s + 1)
            if a & 1:
                me = t if me is None else max(me, t)
            else:
                ms = t if ms is None else max(ms, t)
        self._latest[ns] = (ms, me)

    # ----------------------------------------------------------- reads

    def _dedup_read(self, ns: str, start: int, end: int,
                    addresses: list[int], kind: int) -> dict:
        """(address, time) -> (value-or-payload, seq): first-wins."""
        self._require(ns)
        want = set(addresses)
        best: dict[tuple[int, int], tuple] = {}
        for a, t, v, p, s in self._log[ns]:
            if (a & 1) != kind or a not in want or not start <= t <= end:
                continue
            k = (a, t)
            if k not in best or s < best[k][1]:
                best[k] = (p if kind else v, s)
        return best

    def read_simple(self, ns: str, start: int, end: int,
                    addresses: list[int]) -> list[tuple]:
        """[(address, time, value, seq)] sorted by (address, time)."""
        addrs = [a for a in addresses if (a & 1) == 0]
        if not addresses:
            return []
        best = self._dedup_read(ns, start, end, addrs, kind=0)
        return sorted((a, t, v, s) for (a, t), (v, s) in best.items())

    def read_extended(self, ns: str, start: int, end: int,
                      addresses: list[int]) -> list[tuple]:
        """[(address, time, payload, seq)] sorted by (address, time)."""
        if not addresses:
            return []
        addrs = [a | 1 for a in addresses]
        best = self._dedup_read(ns, start, end, addrs, kind=1)
        return sorted((a, t, p, s) for (a, t), (p, s) in best.items())

    def latest(self, ns: str) -> tuple[int | None, int | None]:
        self._require(ns)
        return self._latest[ns]

    def latest_per_key(self, ns: str) -> dict[int, tuple]:
        """address -> (time, value, payload, seq): (time DESC, seq ASC)
        winner — core.latest_per_key / latestUniques
        (Algorithms.hs:250-262)."""
        self._require(ns)
        best: dict[int, tuple] = {}
        for a, t, v, p, s in self._log[ns]:
            cur = best.get(a)
            if cur is None or t > cur[0] or (t == cur[0] and s < cur[3]):
                best[a] = (t, v, p, s)
        return best


class PureKV:
    """Model of mutable.MutableKV over a PureStore."""

    def __init__(self, store: PureStore, ns: str):
        self.store = store
        self.ns = ns + "_INTERNAL"
        if not store.is_registered(self.ns):
            store.register_namespace(self.ns)

    @staticmethod
    def _key(key: int) -> int:
        return key | 1

    def insert(self, key: int, value: bytes) -> None:
        self.insert_with(lambda new, old: new, key, value)

    def insert_with(self, merge: Callable[[bytes, bytes], bytes],
                    key: int, value: bytes) -> bytes:
        addr = self._key(key)
        cur = self._lookup_versioned(addr)
        if cur is None:
            out, ver = value, 0
        else:
            out, ver = merge(value, cur[0]), cur[1] + 1
        self.store.write_points(self.ns, [(addr, ver, None, out)])
        return out

    def lookup(self, key: int) -> bytes | None:
        got = self._lookup_versioned(self._key(key))
        return None if got is None else got[0]

    def _lookup_versioned(self, addr: int) -> tuple[bytes, int] | None:
        rows = self.store.read_extended(self.ns, 0, 1 << 62, [addr])
        if not rows:
            return None
        _a, t, p, _s = max(rows, key=lambda r: (r[1], -r[3]))
        return p, t

    def enumerate(self) -> dict[int, bytes]:
        return {
            a: p
            for a, (_t, _v, p, _s)
            in self.store.latest_per_key(self.ns).items()
        }
