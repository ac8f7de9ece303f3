"""Runtime-filter tuning: let Spark prune the BIG side of a shuffle join
with a bloom filter built from the SMALL side's join keys.

[absent in reference — north-star extension] At 100 TB the dominant cost of
``fact ⋈ filtered-dim`` is shuffling fact rows whose keys the filtered dim
side will never match. Spark's runtime bloom filter (Catalyst's
``InjectRuntimeFilter``) builds a ``bloom_filter_agg`` over the creation
(small) side's join keys and rewrites the application (big) side to
``Filter(might_contain(key))`` BELOW its exchange — rows are dropped before
they are ever shuffled. This is declarative-plan territory: no operator
code, just configuration — which is exactly the Spark-first posture; the
helper here exists so deployments (and tests) apply a vetted, restorable
conf set instead of scattering magic keys.

Defaults ship conservatively (application side must scan ≥ 10 GB before a
filter is injected — pointless below that, decisive above). On a real
cluster the defaults are already right; ``runtime_filter_confs(force=True)``
drops the size gates so local runs and plan tests can SEE the injection.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

_FORCE_CONFS = {
    # injection is size-gated; locally nothing scans 10 GB, so drop the gate
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # keep the join a shuffle join: a broadcast join already prunes via the
    # hash table, so Catalyst (correctly) skips bloom injection there
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def runtime_filter_confs(force: bool = False) -> dict[str, str]:
    """Conf set enabling runtime bloom-filter injection. ``force=True``
    additionally removes the local-scale gates (see module docstring) —
    use in tests/demos only, never on a cluster."""
    confs = {"spark.sql.optimizer.runtime.bloomFilter.enabled": "true"}
    if force:
        confs.update(_FORCE_CONFS)
    return confs


@contextmanager
def session_confs(spark: SparkSession, confs: dict[str, str]) -> Iterator[None]:
    """Apply runtime session confs, restoring prior values (or unsetting)
    on exit — keeps conf-sensitive demos from leaking into a shared
    session."""
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
