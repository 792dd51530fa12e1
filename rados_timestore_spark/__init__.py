"""rados_timestore_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of christian-marie/rados-timestore.

The reference (read-only at /root/reference) is a Haskell time-series
point store over Ceph/RADOS.  This package re-expresses its data model
(SURVEY.md §1), its full operator inventory (SURVEY.md §2) and its test
strategy (SURVEY.md §5) as an idiomatic Spark DataFrame engine:

* one ``points`` table per namespace, Parquet, partitioned by
  ``(epoch, bucket)`` — the reference's epoch/bucket object layout
  (``lib/TimeStore/Core.hs:203-208``) becomes partition pruning;
* read-time filter → first-write-wins dedup → sort
  (``lib/TimeStore/Algorithms.hs:198-217``) becomes a window dedup over
  an explicit ingest-sequence column;
* the mutable KV view (``lib/TimeStore/Mutable.hs``) becomes a
  latest-per-key aggregate over the same append log;
* plus the LLM-data-pipeline extensions (dedup, similarity search,
  multimodal columns, text analysis) the north star demands.
"""

from rados_timestore_spark.session import get_spark, configure_session
from rados_timestore_spark.store import TimeStore
from rados_timestore_spark.mutable import MutableKV

__all__ = ["get_spark", "configure_session", "TimeStore", "MutableKV"]

__version__ = "0.1.0"
