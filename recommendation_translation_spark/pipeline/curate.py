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

    and return per-stage survivor counts (the dataset-card numbers).
    """
    stats: dict[str, int] = {"input": docs.count()}

    # 1. scan-side gates: quality + blocklist fuse into one pass
    q = quality_flags(docs, min_words=min_words).select("doc_id", "keep")
    gated = docs.join(q, "doc_id").filter(F.col("keep")).drop("keep")
    if blocklist:
        gated = blocklist_filter(gated, blocklist).filter(~F.col("blocked")).drop(
            "n_blocked_terms", "blocked"
        )
    gated = gated.cache()
    stats["after_gates"] = gated.count()

    # 2. exact dedup: keep the min-id representative of each content.
    # keep_ids is corpus-sized (one row per distinct content), so it
    # must NOT broadcast — a left-semi shuffle join on the id is the
    # scale-correct shape (AQE still broadcasts when it happens to be
    # small).
    keep_ids = dedup_exact(gated).select(F.col("keep_id").alias("doc_id"))
    uniq = gated.join(keep_ids, "doc_id", "left_semi")
    stats["after_exact_dedup"] = uniq.count()

    # 3. near-dup resolution: drop docs dominated by a better pair
    pairs = ngram_jaccard_pairs(uniq, n=3, threshold=jaccard_threshold)
    with_q = uniq.withColumn("q_len", F.length("text").cast("long"))
    kept = keep_best_per_pair(with_q, pairs, "q_len").drop("q_len")
    stats["after_near_dedup"] = kept.count()

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
    packed = packed.withColumn(
        "shard", F.expr(f"pack_id div {int(packs_per_shard)}")
    ).cache()
    stats["kept"] = packed.count()

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
