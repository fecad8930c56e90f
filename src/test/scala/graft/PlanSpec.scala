package graft

/** Plan-shape regression guards: the properties that make these
  * operators viable at 100 TB — filter/column pushdown into the parquet
  * scan, broadcast joins for fixed-size dims, partial aggregation before
  * the exchange — asserted from explain output so a refactor can't
  * silently regress them.
  */
class PlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def planOf(q: String): String = {
    val df = SparkEntry.queries(q)(spark, d)
    df.queryExecution.executedPlan.toString
  }

  test("filters and projections reach the parquet scan") {
    val p = planOf("p2_eq_filter")
    assert(p.contains("PushedFilters") &&
      p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("ReadSchema") && !p.contains("c_address"),
      "projection must prune unused columns")
  }

  test("fixed-size dim chain joins are broadcast, not shuffled") {
    val p = planOf("j2_multihop")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("grouped aggregation has a map-side partial phase") {
    val p = planOf("q1_agg")
    // partial HashAggregate appears below the exchange, final above
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    val lastAgg = p.lastIndexOf("HashAggregate")
    assert(firstAgg >= 0 && exchange >= 0 && lastAgg > firstAgg, p)
  }

  test("time-range predicate pushes down to the scan") {
    val p = planOf("p5_between_year")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("LessThanOrEqual(l_shipdate"), p)
  }

  test("similarity query broadcasts the small query side") {
    val p = planOf("s1_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("LSH bucket validity filter stays cheap (no hash pipeline in the Filter)") {
    // the mh_ok flag must inline to a token-count check at the scan; a
    // filter re-deriving minhash components costs 40x (NOTES.md
    // plan-shape traps — measured 0.7 s -> 32 s at sf0.1)
    val p = planOf("d3_lsh_buckets")
    val filterLines = p.linesIterator.filter(_.contains("Filter")).toSeq
    assert(filterLines.nonEmpty, p)
    filterLines.foreach { l =>
      assert(!l.contains("md5") && !l.contains("conv("),
        s"expensive hash pipeline inlined into a Filter:\n$l")
    }
  }

  test("near-dup pair join is blocked on (label, bucket), never label alone") {
    val p = planOf("s3_near_dup")
    // the equi-join key must include the LSH sign bucket — label-only
    // blocking is an unbounded O(n²) block at scale
    val joinLine = p.linesIterator
      .find(l => l.contains("Join") && l.contains("label"))
      .getOrElse(fail(s"no join on label found in plan:\n$p"))
    assert(joinLine.contains("bucket"), joinLine)
  }

  test("gram explodes admit no inferred size() filter at the scan") {
    // InferFiltersFromGenerate on a non-outer explode pushes a
    // size(arr) > 0 filter to the scan with the whole shingle tree
    // inlined — re-tokenizing per gram slot (measured 18x on d10).
    // The explode_outer form must keep tokenization out of every
    // Filter and out of the scan's data filters.
    for (q <- Seq("d10_decontaminate", "t7_repetition")) {
      val p = planOf(q)
      p.linesIterator
        .filter(l => l.contains("Filter") || l.contains("FileScan"))
        .foreach { l =>
          assert(!l.contains("split("),
            s"$q: tokenization inlined into a Filter/scan:\n$l")
        }
    }
  }

  test("decontamination broadcasts the benchmark gram set") {
    // the eval-set grams must be the broadcast side: at 100 TB the
    // exploded training grams never shuffle — the join is a map-side
    // semi-filter followed by one per-doc aggregation
    val p = planOf("d10_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("source-mix quota table is broadcast, docs shuffle once by source") {
    val p = planOf("x7_source_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("banded interval join runs as a hash join, not a nested loop") {
    val p = planOf("x3_interval_join")
    assert(!p.contains("NestedLoop"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("CV validation anti-joins broadcast the vocabulary") {
    // the CV dims are tiny; a shuffled anti-join would move the whole
    // fact table for an 8-row vocabulary
    val p = planOf("cv1_violations")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ANN serving queries build ONE plan for the whole query batch") {
    // the per-query shape (a driver loop unioning one filter branch +
    // literal ADC tables per query vector) scales plan size and
    // encoded-frame scans linearly with the batch; the serving shape
    // is a broadcast query TABLE, so the plan must contain no Union
    // and the candidate side must join broadcast
    for (q <- Seq("s7_pq_adc_topk", "s8_ivfpq_topk", "s9_ivfpq_multiprobe")) {
      val p = planOf(q)
      assert(!p.contains("Union"),
        s"$q: per-query union branches are back:\n$p")
      assert(p.contains("BroadcastHashJoin") ||
        p.contains("BroadcastNestedLoopJoin"), s"$q: query side not broadcast")
    }
    // and the cell-routed variants join candidates on the cell key
    for (q <- Seq("s8_ivfpq_topk", "s9_ivfpq_multiprobe")) {
      val p = planOf(q)
      val joinLine = p.linesIterator
        .find(l => l.contains("BroadcastHashJoin") && l.contains("cell"))
      assert(joinLine.isDefined, s"$q: no broadcast hash join on cell:\n$p")
    }
  }

  test("ingest gate verification store is membership-pruned at the " +
      "scan (d12): the bloom probe sits ahead of any exchange") {
    // the grams side must pre-drop docs that are neither plausibly
    // indexed (the artifact's sketch) nor arriving BEFORE anything
    // ships — at 100 TB this is what keeps the gate's verification
    // side from shingling the whole table
    val p = planOf("d12_ingest_gate")
    val lines = p.linesIterator.toSeq
    val fi = lines.indexWhere(_.contains("bloom_might_contain"))
    assert(fi >= 0, p)
    val below = lines.drop(fi + 1)
    val scanI = below.indexWhere(l =>
      l.contains("Scan parquet") || l.contains("FileScan"))
    assert(scanI >= 0, p)
    assert(!below.take(scanI).exists(_.contains("Exchange")), p)
  }

  test("vector ingest gate serves the artifact's stored buckets " +
      "(s13): touched-bucket In filter pushed to the corpus scan, " +
      "no signBucket derivation on the stored side") {
    val p = planOf("s13_vec_ingest_gate")
    // the batch's touched-bucket set reaches the corpus scan as a
    // PUSHED In filter — row groups of un-touched buckets never
    // leave disk against the bucket-sorted layout
    val pushedIn = p.linesIterator.find(l =>
      l.contains("PushedFilters") && l.contains("In(bucket"))
    assert(pushedIn.isDefined, p)
    // exactly ONE subtree derives sign-buckets (the arriving batch,
    // batch-sized); the stored side reads the persisted column. The
    // derivation is the element_at CASE chain — count its plan
    // occurrences: one projection over the embeddings scan, which
    // feeds both gate sides of the batch, plus none over the corpus
    val scanLines = p.linesIterator.filter(l =>
      l.contains("Scan parquet") || l.contains("FileScan")).toSeq
    assert(!scanLines.exists(l =>
      l.contains("corpus") && l.contains("element_at")), p)
  }
}
