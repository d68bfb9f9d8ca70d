"""Stateful streaming operators — applyInPandasWithState.

``streaming_url_seen_dedup`` is the streaming twin of the batch URL-seen
anti-join (SURVEY.md §2.3 J9 / §2.9 T2): a stream of candidate URLs is
deduplicated against per-bucket state so each canonical URL is emitted
exactly once across all micro-batches.

State layout mirrors the batch engine's bucketed url_seen table: the stream
is grouped by ``pmod(url_hash, n_buckets)`` and each group keeps its seen
hash set as state (a binary-packed int64 array — Spark state rows must be
fixed-schema, so the set is serialized to bytes with numpy). At production
scale per-bucket state would be an RocksDB-backed hash set; the grouping
key layout — and therefore the shuffle plan — is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "url_hash long, canonical_url string"
STATE_SCHEMA = "seen binary"


def _dedup_group(key, pdfs, state: GroupState):
    if state.exists:
        (seen_bytes,) = state.get
        seen = set(np.frombuffer(seen_bytes, dtype=np.int64).tolist())
    else:
        seen = set()
    out_hashes: list[int] = []
    out_urls: list[str] = []
    for pdf in pdfs:
        for h, u in zip(pdf["url_hash"], pdf["canonical_url"]):
            h = int(h)
            if h not in seen:
                seen.add(h)
                out_hashes.append(h)
                out_urls.append(u)
    state.update((np.array(sorted(seen), dtype=np.int64).tobytes(),))
    yield pd.DataFrame({"url_hash": out_hashes, "canonical_url": out_urls})


def streaming_url_seen_dedup(
    candidates: DataFrame, n_buckets: int = 16
) -> DataFrame:
    """Exactly-once URL emission over a (possibly streaming) candidate
    DataFrame with columns (url_hash long, canonical_url string)."""
    bucketed = candidates.withColumn(
        "__bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets))
    )
    return bucketed.groupBy("__bucket").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
