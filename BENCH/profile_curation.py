#!/usr/bin/env python
"""Stage decomposition of q_corpus_curation (guide §1: measure first).

Times each pipeline stage to a noop sink in dependency order so every
number is the incremental cost of that stage's plan over its input.
Not part of the driver bench contract (bench.py is frozen).
"""
from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

from logcrawler_spark.session import get_spark


def noop(df, label):
    spark = df.sparkSession
    spark.sparkContext.setJobDescription(label)
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    print(f"[curation-stage] {label}: {dt:.3f}s", flush=True)
    return dt


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus, "profile-curation", shuffle_partitions=max(cpus, 8))

    from logcrawler_spark.functions.text import (
        lang_id_from,
        quality_score_from,
        with_tokens,
    )
    from logcrawler_spark.operators.dedup import (
        decontaminate,
        exact_dedup,
        minhash_lsh_pairs,
        minhash_sig_table,
        ngram_jaccard_pairs,
        shingles,
    )
    from logcrawler_spark.utils import materialize

    from logcrawler_spark.utils import ensure_min_partitions

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for rep in range(int(os.environ.get("PROFILE_REPS", "2"))):
        print(f"--- rep {rep} ---", flush=True)
        t_all = time.monotonic()
        toked = with_tokens(ensure_min_partitions(d))
        tk = F.col("toks")
        scored = toked.filter(F.size(tk) > 0).select(
            "doc_id",
            "text",
            lang_id_from(tk).alias("lang_pred"),
            quality_score_from(tk, F.col("text")).alias("quality"),
            F.size(tk).alias("n_tokens"),
        )
        kept = scored.filter(
            (F.col("lang_pred") == "en") & (F.col("quality") >= 0.3)
        )
        noop(kept, "1 lang+quality filter")
        t0 = time.monotonic()
        uniq = materialize(exact_dedup(kept, "text", "doc_id"))
        print(f"[curation-stage] 2 exact_dedup+materialize: "
              f"{time.monotonic()-t0:.3f}s", flush=True)
        t0 = time.monotonic()
        sig = materialize(minhash_sig_table(uniq, "text", "doc_id", 8, 3))
        print(f"[curation-stage] 3 minhash_sig+materialize: "
              f"{time.monotonic()-t0:.3f}s", flush=True)
        pairs = ngram_jaccard_pairs(
            uniq, "text", "doc_id", n=3, threshold=0.5, lsh_k=8, lsh_bands=4
        )
        t0 = time.monotonic()
        drops = materialize(
            pairs.select(F.col("id_b").alias("doc_id")).distinct()
        )
        print(f"[curation-stage] 4 lsh+jaccard+drops (incl its own "
              f"sig rebuild): {time.monotonic()-t0:.3f}s", flush=True)
        survivors = uniq.join(drops, on="doc_id", how="left_anti")
        bench_docs = d.filter(F.col("doc_id") % 97 == 0)
        flagged = decontaminate(
            survivors, bench_docs, n=13, hash_grams=True
        ).select(F.col("id").alias("doc_id"))
        out = survivors.join(flagged, on="doc_id", how="left_anti").select(
            "doc_id", "lang_pred", "quality", "n_tokens"
        )
        noop(out, "5 decontaminate+final")
        print(f"[curation-stage] TOTAL: {time.monotonic()-t_all:.3f}s",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
