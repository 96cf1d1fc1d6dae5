"""End-to-end corpus curation pipeline (extension surface).

Chains the individually-verified curation operators into the shape a
pretraining data job actually runs:

    quality gates → blocklist → exact dedup → near-dup keep-best →
    per-source quota → weighted interleave → sequence packing →
    sharded JSONL export + parquet manifest

Every stage is the operator already pinned by the oracle-parity and
plan tests (operators.curation / operators.dedup); this module is pure
composition — it adds no new relational logic, only the glue and the
artifact layout.  No reference counterpart (the reference's pipeline is
the ML ranking flow in cli.py); cited design: C4 (Raffel et al. 2020)
and Gopher (Rae et al. 2021) curation orders.

Scale notes: each stage hands the next a DataFrame, so Catalyst fuses
the scan-side stages (quality, blocklist, hash-split columns) into one
pass over the corpus; the only corpus-wide shuffles are the ones the
algorithms require (dedup digest groupBy, shingle join, the final
range-partitioned orderings).  The JSONL export shards by ``pack_id
div packs_per_shard`` — deterministic shard assignment, no global sort
at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import (
    blocklist_filter,
    interleave_sources,
    keep_best_per_pair,
    pack_sequences,
    quality_flags,
    source_quota,
)
from ..operators.dedup import dedup_exact, ngram_jaccard_pairs
from ..operators.text import tokens

__all__ = ["curate_corpus"]


def curate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    blocklist: list[str] | None = None,
    jaccard_threshold: float = 0.5,
    per_source: int = 1_000_000,
    mix_weights: dict[str, int] | None = None,
    seq_len: int = 512,
    packs_per_shard: int = 1024,
    min_words: int = 5,
) -> dict[str, int]:
    """Run the full curation chain on ``docs`` (doc_id, text, source,
    lang) and write training-ready artifacts under ``out_dir``:

    - ``corpus.jsonl/`` — kept documents with mix_rank/pack columns,
      sharded by pack range (gzip JSONL);
    - ``manifest.parquet/`` — (doc_id, source, n_tokens, mix_rank,
      pack_id, pack_offset, n_spanned, shard) for every kept doc;

    and return per-stage survivor counts plus free Observation-API
    metrics (the dataset-card numbers).

    Progress accounting rides the jobs the pipeline already runs
    (``df.observe`` / CollectMetrics — metrics accumulate during
    execution, no extra pass): the input count fires during the gate
    job, the post-exact-dedup count during the near-dup job, and the
    token/pack totals during the pack-cache job.  At 100 TB that
    removes two full corpus scans the round-3 version spent on bare
    ``.count()`` stats.  A node referenced twice in one plan (docs,
    uniq below) still reports exact metrics: the first completed
    execution sets the Observation, verified in
    tests/test_curate_pipeline.py.
    """
    import uuid as _uuid

    from pyspark.sql import Observation

    stats: dict[str, int] = {}
    _run = _uuid.uuid4().hex[:8]  # unique metric names per invocation

    # 1. scan-side gates: quality + blocklist fuse into one pass; the
    # input count is observed during the same job (docs is scanned for
    # the join anyway)
    obs_in = Observation(f"curate_input_{_run}")
    docs = docs.observe(obs_in, F.count(F.lit(1)).alias("n"))
    q = quality_flags(docs, min_words=min_words).select("doc_id", "keep")
    gated = docs.join(q, "doc_id").filter(F.col("keep")).drop("keep")
    if blocklist:
        gated = blocklist_filter(gated, blocklist).filter(~F.col("blocked")).drop(
            "n_blocked_terms", "blocked"
        )
    gated = gated.cache()
    stats["after_gates"] = gated.count()
    stats["input"] = int(obs_in.get["n"])

    # 2. exact dedup: keep the min-id representative of each content.
    # keep_ids is corpus-sized (one row per distinct content), so it
    # must NOT broadcast — a left-semi shuffle join on the id is the
    # scale-correct shape (AQE still broadcasts when it happens to be
    # small).
    keep_ids = dedup_exact(gated).select(F.col("keep_id").alias("doc_id"))
    obs_uniq = Observation(f"curate_after_exact_dedup_{_run}")
    uniq = gated.join(keep_ids, "doc_id", "left_semi").observe(
        obs_uniq, F.count(F.lit(1)).alias("n")
    )

    # 3. near-dup resolution: drop docs dominated by a better pair.
    # The exact-dedup survivor count is observed during this job —
    # uniq feeds both the shingle pipeline and the keep side.
    pairs = ngram_jaccard_pairs(uniq, n=3, threshold=jaccard_threshold)
    with_q = uniq.withColumn("q_len", F.length("text").cast("long"))
    kept = keep_best_per_pair(with_q, pairs, "q_len").drop("q_len")
    stats["after_near_dedup"] = kept.count()
    stats["after_exact_dedup"] = int(obs_uniq.get["n"])

    # 4. per-source quota, then the training mix order
    quota = source_quota(
        kept.withColumn("q_len", F.length("text").cast("long")),
        per_source=per_source,
        quality_col="q_len",
    ).drop("q_len", "source_rank")
    mixed = interleave_sources(quota, "source", mix_weights or {})

    # 5. token accounting + sequence packing over the mix order
    with_tokens = mixed.withColumn(
        "n_tokens", F.size(tokens(F.col("text"))).cast("long")
    )
    packed = pack_sequences(with_tokens, seq_len=seq_len, id_col="mix_rank")
    obs_packed = Observation(f"curate_packed_{_run}")
    packed = (
        packed.withColumn("shard", F.expr(f"pack_id div {int(packs_per_shard)}"))
        .observe(
            obs_packed,
            F.sum("n_tokens").alias("total_tokens"),
            F.max("pack_id").alias("max_pack_id"),
            F.max("shard").alias("max_shard"),
        )
        .cache()
    )
    stats["kept"] = packed.count()
    # free dataset-card totals, observed during the cache job above
    m = obs_packed.get
    stats["total_tokens"] = int(m["total_tokens"] or 0)
    stats["n_packs"] = int(m["max_pack_id"]) + 1 if m["max_pack_id"] is not None else 0
    stats["n_shards"] = int(m["max_shard"]) + 1 if m["max_shard"] is not None else 0

    # 6. artifacts: sharded JSONL corpus + parquet manifest
    from ..sources.writers import write_jsonl, write_parquet

    write_jsonl(
        packed.select(
            "doc_id", "source", "text", "mix_rank", "pack_id", "pack_offset", "shard"
        ),
        f"{out_dir}/corpus.jsonl",
        partition_by=["shard"],
    )
    write_parquet(
        packed.select(
            "doc_id", "source", "n_tokens", "mix_rank",
            "pack_id", "pack_offset", "n_spanned", "shard",
        ),
        f"{out_dir}/manifest.parquet",
    )
    gated.unpersist()
    # packed was cached for the count + the two writes; release it so
    # the full packed corpus isn't left pinned in executor storage
    # after the pipeline returns (round-3 advisor note).
    packed.unpersist()
    return stats
