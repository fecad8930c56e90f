package graft

import java.nio.file.{Files, Paths}

/** Generates PLANS.md: formatted physical plans for one representative
  * query per operator family — the written evidence that filters and
  * projections reach the scan, dims broadcast, aggregations have
  * map-side partial phases, and hot expressions stay inside
  * whole-stage codegen. Run: `sbt "runMain graft.Explain"`.
  */
object Explain {
  private val Representative = Seq(
    "p2_eq_filter" -> "filter + projection pushdown to parquet",
    "p5_between_year" -> "time-range pushdown",
    "q1_agg" -> "grouped aggregation (partial + final)",
    "j1_dim_join" -> "fact-dim join (AQE decides broadcast vs shuffle)",
    "j2_multihop" -> "fixed-size dim chain (broadcast hash joins)",
    "w3_run_groups" -> "gaps-and-islands windows",
    "v1_pivot_wide" -> "explicit-domain pivot (no eager distinct)",
    "d3_lsh_buckets" -> "minhash + banded LSH projection (cheap validity filter at the scan)",
    "s1_cosine_topk" -> "broadcast query set + native vec_dot + sort-free top-k (TopKMin aggregator, no window sort)",
    "s3_near_dup" -> "near-dup pairs blocked on (label, sign-bucket) — bounded blocks",
    "s4_ivf_topk" -> "IVF with seeded-Lloyd-trained centroids (native ivf_assign loop, cell = shuffle key)",
    "j3_semi_join" -> "left-semi join — AQE broadcasts the small-at-runtime build side",
    "x1_asof_join" -> "as-of join via union + window",
    "x3_interval_join" -> "banded interval join (equi hash join on time bands)",
    "t6_top_tokens" -> "explode + two-level aggregation + top-k",
    "d10_decontaminate" -> "benchmark gram set broadcast — training grams never shuffle",
    "x7_source_mix" -> "integer-exact quotas broadcast + per-source rank window",
    "x9_threshold_mix" -> "no-sort mix fill: broadcast quota + codegen'd 128-bit threshold filter (zero windows)",
    "x8_corpus_final" -> "corpus gate: semi/anti hash joins compose the pipeline stages",
    "t10_dup_gram_frac" -> "duplicate-gram fraction: grams shuffle as 60-bit hashes, two hash aggregations + one equi join",
    "x10_funnel" -> "funnel report: stage flags from two left joins, folded in one aggregation pass",
    "s7_pq_adc_topk" -> "PQ encode via native pq_assign + broadcast query table scored by native pq_adc (one plan for any batch)",
    "s9_ivfpq_multiprobe" -> "IVFPQ serving: probe cells ranked per query, candidates hash-joined on cell, ADC shortlist + exact re-rank",
    "s12_filtered_ann" -> "filtered ANN: the metadata predicate rides the candidate join key (cell, label) — no post-filter pass",
    "cv1_violations" -> "CV validation: vocabulary broadcast into a LeftAnti hash join, violation counts aggregated map-side",
    "d12_ingest_gate" -> "ingest admission gate served from the persisted index: artifact bucket probe (bucket-sorted band files; the touched-bucket In pushdown is cost-based and OFF at this store size), verification store membership-pruned at the scan and scanned ONCE per batch (melt/regroup), earliest-wins admission (one aggregation)",
    "s13_vec_ingest_gate" -> "embedding ingest gate served from the gate-stamped artifact: stored cells/norms/sign-buckets (no corpus re-encode), touched-bucket In filter pushed to the corpus scan, exact-cosine confirm",
    "s17_adc_gate" -> "opt-in ADC-shortlisted gate: batch lookup tables staged once per row (native pq_tables), stored PQ codes scored by pq_adc_lookup inside the confirm join — pairs below the bar never reach the full-dim vec_dot confirm",
    "x11_cdc_apply" -> "CDC apply: changelog collapsed by max_by (partial aggregate collapses keys before the exchange; no whole-log window), base anti-joins the keys",
    "s15_index_delete" -> "serve after takedown: the artifact scan reads the compacted post-delete corpus (tombstoned rows physically gone — no runtime filter pays for them), DPP pins the cell routing exactly as s8/s11",
    "x12_incr_agg" -> "incremental MV maintenance: base touched only by a churn-keyed hash semi-join (never re-aggregated); -old/+new contributions merge with the previous aggregate in ONE summing aggregation (null-group safe, no join)",
    "x13_snapshot_diff" -> "version diff: tagged union collapsed in ONE keyed aggregation (no join — one exchange, nothing to zip over union-shaped version plans)",
    "x14_incr_minmax" -> "non-invertible view maintenance: untouched groups anti-join-carry from the previous aggregate; only churn-touched groups re-aggregate from the applied snapshot",
    "j8_bloom_join" -> "bloom semi-join pruning: codegen'd bloom_might_contain probe (bitset as one task-shared reference object) drops non-joinable fact rows before the exchange; false positives die in the exact join",
    "d14_member_prune" -> "membership-pruned index serving: the persisted live-id bloom beside the DedupIndex artifact pre-drops fact rows in the scan stage, ahead of the exact semi-join's exchange; false positives (incl. tombstoned ids the sketch cannot unlearn) die in the exact join",
    "x17_cdc_partitioned" -> "copy-on-write CDC: each batch reads/rewrites only churned buckets (explicit per-bucket path selection — cold buckets never listed); version read assembles immutable bucket files via the manifest",
    "x18_cow_incr_agg" -> "COW-maintained view: maintainAggs' churn-keyed semi-join fed with the churned-bucket slice — the maintenance job never reads a cold bucket; group-sized aggregate versions whole",
    "x19_cow_diff" -> "bucket-pruned version diff: both scan legs assemble ONLY the manifest-differing buckets (explicit path selection), then the tagged union collapses in one keyed aggregation exactly as x13")

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-explain")
    val d = "/root/testdata/sf0.01"
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of representative queries\n\n")
    sb.append("Generated by `sbt \"runMain graft.Explain\"` at sf0.01.\n")
    sb.append("What to look for: `PushedFilters`/`ReadSchema` on every\n")
    sb.append("scan, `BroadcastHashJoin` on dim joins, partial+final\n")
    sb.append("`HashAggregate` pairs around exchanges, and `*(n)`\n")
    sb.append("whole-stage-codegen markers on the hot operators.\n")
    for ((q, note) <- Representative) {
      val plan = SparkEntry.queries(q)(spark, d)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append(s"\n## $q — $note\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${Representative.size} plans)")
    spark.stop()
  }
}
