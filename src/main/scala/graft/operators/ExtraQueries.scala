package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.CdcOps

/** Coverage completions for SURVEY.md §2 rows not already exercised by
  * the core inventory: point selection by key set (P10), sentinel
  * pretty-printing (F6), global re-key with catalog recompute
  * (F12 + A5), exact percentiles, rollup aggregation, and the
  * approx-distinct scale path.
  */
object ExtraQueries {
  import Tables._

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P10: point selection by key set — join against a keys frame
    // (reference: select by id/datetime list, edit_service.py:169-184).
    // The key list is tiny and broadcast; at scale this is the
    // broadcast-semi-join idiom, never a giant isin literal.
    "p10_key_select" -> ((s, d) => {
      val keys = s.range(0, 50).select(
        (col("id") * 197 + 11).as("event_id"))
      events(s, d).join(broadcast(keys), Seq("event_id"), "left_semi")
        .select("event_id", "user_id", "value")
    }),

    // F6: sentinel pretty-print — integral floats render as integers
    // (reference: float.is_integer() formatting, DatasetUtilities.py:642).
    // Non-integral values render via exact INTEGER string math on
    // micro-units (6 decimal places, trailing zeros trimmed) rather
    // than the engine's double→string cast: Spark's cast goes
    // scientific outside ~[1e-3, 1e7) where DuckDB prints plain
    // decimal, so the cast-based rendering was a latent cross-engine
    // break waiting for a wider data generation. Integer division /
    // modulo / lpad are bit-identical everywhere.
    "f6_pretty_sentinel" -> ((s, d) => {
      val micros = "abs(cast(round(value * 1000000, 0) as bigint))"
      val whole = s"cast($micros div 1000000 as string)"
      val frac =
        s"regexp_replace(lpad(cast($micros % 1000000 as string), 6, '0')," +
          " '0+$', '')"
      events(s, d).select(
        col("event_id"),
        when(col("value") === floor(col("value")),
          col("value").cast("long").cast("string"))
          .otherwise(concat(
            when(col("value") < 0, lit("-")).otherwise(lit("")),
            expr(whole),
            when(expr(frac) === "", lit(""))
              .otherwise(concat(lit("."), expr(frac)))))
          .as("value_str"))
    }),

    // F12 + A5: global re-key of a series and catalog-row recompute
    // (reference: edit_service.py:375-391, 407-428 + :430-434).
    "f12_rekey_catalog" -> ((s, d) =>
      events(s, d)
        .withColumn("qc_level", lit(1L))
        .groupBy(col("user_id"), col("qc_level"))
        .agg(
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("begin_ts"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_ts"),
          count(lit(1)).as("n"))),

    // Exact interpolated percentiles (engine feature beyond the
    // reference; DuckDB quantile_cont is the same linear-interpolation
    // definition).
    "a8_percentiles" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"),
          round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99_price"))),

    // Rollup: hierarchical subtotals (engine completeness; maps to the
    // same shuffle as a grouping-sets expansion).
    // Exact-cents sum (like w9/a11/x12): a double sum is
    // partition-order-dependent, so round(sum(double), 2) is a latent
    // cross-engine flake whenever a group's sum lands within ulps of a
    // .xx5 boundary; summing exact integer cents is order-free. The
    // cents here sum as DECIMAL, not BIGINT: the rollup's grand-total
    // group aggregates the WHOLE table, and at ~10¹¹ rows × ~10⁷ cents
    // a Long sum crosses 2⁶³ and ANSI mode throws where DuckDB's
    // HUGEINT sum would not — grand-total-class groups get the 128-bit
    // accumulator; bounded-group windows (w9 etc.) keep cheap Longs.
    "a9_rollup" -> ((s, d) =>
      orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          (sum(expr("cast(round(o_totalprice * 100, 0) as decimal(20,0))"))
            / 100.0).as("sum_price"))),

    // As-of join: each purchase picks up the latest click value at or
    // before its timestamp per user — composed union+window (see
    // operators.AsOfJoin); the oracle is DuckDB's native ASOF JOIN.
    "x1_asof_join" -> ((s, d) => {
      val e = events(s, d)
      val right = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("click_value"))
      val left = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      graft.operators.AsOfJoin.asOf(left, right, Seq("user_id"), "ts",
          "click_value", "click_value")
        .select("event_id", "user_id", "value", "click_value")
    }),

    // RANGE-frame window: trailing 1-hour sum per user, on exact cents
    // so the sliding sum is engine-deterministic.
    "w9_range_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, 0L)
      events(s, d)
        .withColumn("cents", graft.operators.PivotOps.centsOf(col("value")))
        .select(col("event_id"), col("user_id"),
          (sum(col("cents")).over(w) / lit(100.0)).as("hour_sum"))
    }),

    // Deterministic train/val/test split: the split is a pure function
    // of the stable content id (hash bucket 0-99 → 80/10/10), so it is
    // reproducible across runs, engines, and repartitioning — never
    // rand()-based. Output: per (lang, split) counts.
    "x4_hash_split" -> ((s, d) => {
      val bucket = pmod(graft.operators.TextOps.hash15(
        concat(lit("split|"), col("doc_id"))), lit(100))
      val split = when(bucket < 80, "train")
        .when(bucket < 90, "val").otherwise("test")
      documents(s, d)
        .select(col("lang"), split.as("split"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n"))
    }),

    // x5: deterministic stratified sampling — per-stratum keep rates
    // (the data-mixing primitive: oversample scarce languages,
    // downsample dominant ones) decided by a hash bucket of the stable
    // doc id, never rand(): reproducible across runs, engines, and
    // repartitioning. Output: per-lang kept/total.
    "x5_stratified_sample" -> ((s, d) => {
      val bucket = pmod(graft.operators.TextOps.hash15(
        concat(lit("strat|"), col("doc_id"))), lit(100))
      val rate = when(col("lang") === "en", 50)
        .when(col("lang") === "de", 30).otherwise(10)
      documents(s, d)
        .select(col("lang"), (bucket < rate).cast("int").as("keep"))
        .groupBy(col("lang"))
        .agg(sum(col("keep")).as("kept"), count(lit(1)).as("total"))
    }),

    // x6: sequence packing — assign documents to fixed token-budget
    // bins (the LLM-training context-window packing step) by exclusive
    // prefix sum over a deterministic order, bin = floor(prefix/budget).
    // lang has cardinality ~3, so a plain per-lang cumsum window would
    // serialize each language's whole token stream through ONE task;
    // PackOps.packBins computes the identical prefix hierarchically
    // (bounded per-shard windows + broadcast shard offsets), so the
    // bins — and this oracle — are unchanged while every stage stays
    // parallel at corpus scale. Token counts are exact ints, so bin
    // assignment is engine-identical. Output: per (lang, bin) doc
    // count + tokens.
    "x6_seq_pack" -> ((s, d) => {
      val budget = 2048L
      graft.operators.PackOps.packBins(
          documents(s, d).select(col("lang"), col("doc_id"),
            size(graft.operators.TextOps.tokens(col("text")))
              .cast("long").as("toks")),
          groupCol = "lang", orderCol = "doc_id", weightCol = "toks",
          budget = budget)
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("sum_toks"))
    }),

    // x7: temperature-weighted source mixing — the data-mixing step
    // that rebalances a multi-source corpus before training: source s
    // gets a quota n_s = floor(T · w_s) with weights w_s ∝ c_s^0.5
    // (temperature 0.5 flattens the source distribution), and the quota
    // is filled by the n_s docs with the smallest stable hash — never
    // rand(). Everything is integer-exact: the sqrt is floored to a
    // BIGINT before the denominator sum (a double Σ√c would be
    // partition-order-dependent), and the quota is integer division.
    // Scale: the quota table is one row per source (broadcast); the
    // rank is one per-source window — at extreme per-source
    // cardinality swap [[SourceMix.exactMix]] for
    // [[SourceMix.thresholdMix]] (approximate quota, NO sort), same
    // hash-prefix selection semantics (spec'd equivalent in
    // ScaleOpsSpec).
    "x7_source_mix" -> ((s, d) => {
      val docs = documents(s, d)
      graft.operators.SourceMix.exactMix(docs,
        graft.operators.SourceMix.quotas(docs, totalBudget = 100L))
    }),

    // x9: the NO-SORT fill path of the same mixing step — hash-threshold
    // cut (approximate quota, a codegen'd filter after a broadcast join,
    // zero windows). The threshold comparison is exact integer
    // arithmetic (decimal128 / HUGEINT), so the selection is
    // bit-reproducible and the per-source counts hash-gate against the
    // oracle. This is the fill you run at extreme per-source
    // cardinality; x7's exact rank is the bounded-cardinality fill.
    "x9_threshold_mix" -> ((s, d) => {
      val docs = documents(s, d)
      graft.operators.SourceMix.thresholdMix(docs,
          graft.operators.SourceMix.quotas(docs, totalBudget = 100L))
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
    }),

    // J8 (extension): bloom semi-join pruning — the fact scan is
    // pre-filtered by a fixed-memory membership sketch of the filtered
    // dim's keys BEFORE the join exchange (operators.BloomPrune).
    // False positives survive the probe and die in the exact join, so
    // the result is byte-identical to the plain join — which is
    // exactly what the oracle computes; the sketch's only observable
    // effect is fewer fact rows shuffled (spec-measured).
    "j8_bloom_join" -> ((s, d) => {
      // persisted: the dim is otherwise scanned three times (sizing
      // count, bloom build, join build side). Released by the
      // centralized Verify/Bench clearCache between queries (d4's
      // convention).
      val dim = orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").persist()
      val (bits, k) = graft.operators.BloomPrune.buildSized(
        dim, "o_orderkey",
        expectedKeys = math.max(1L, dim.count()), fpp = 0.01)
      val pruned = graft.operators.BloomPrune.prune(
        lineitem(s, d), "l_orderkey", bits, k)
      // decimal cents accumulator — 3 return flags over the whole
      // fact table are grand-total-class groups (see a9_rollup)
      pruned.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
          (sum(expr("cast(round(l_extendedprice * 100, 0) as decimal(20,0))"))
            / 100.0).as("sum_price"))
    }),

    // Banded interval join: clicks in the 5 minutes before each
    // purchase, as a (user, time-band) equi hash join with the exact
    // window as a post-filter (see operators.IntervalJoin) — never a
    // nested-loop theta join. Oracle uses the plain inequality join.
    "x3_interval_join" -> ((s, d) => {
      val e = events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = e.filter(col("event_type") === "click")
        .select("user_id", "ts")
      graft.operators.IntervalJoin.trailingCount(
          purchases, clicks, Seq("user_id"), "ts", 300L, "clicks_5m")
        .select("event_id", "user_id", "clicks_5m")
    }),

    // Salted two-phase aggregation over genuinely hot keys (only 5
    // event types → at scale each key is one giant partition): partial
    // aggregate on (key, salt), final on key. Result must be identical
    // to the direct aggregation, which is what the oracle computes.
    "x2_salted_agg" -> ((s, d) =>
      graft.operators.SkewOps.saltedAgg(
        events(s, d).withColumn("cents",
          graft.operators.PivotOps.centsOf(col("value"))),
        "event_type", 16, col("event_id"),
        partial = Seq(sum(col("cents")).as("pc"),
          count(lit(1)).as("pn")),
        finalAgg = Seq(
          (sum(col("pc")) / lit(100.0)).as("sum_v"),
          sum(col("pn")).as("cnt")))),

    // Approx-percentile — the single-pass bounded-memory quantile path
    // (t-digest-style sketch) for 100 TB where exact percentile sorts
    // each group. Gated like a10: the output carries the exact
    // percentiles plus flags that the estimate is within one unit of
    // quantity (rank error at accuracy 10000 is far tighter); the
    // oracle computes exact + literal TRUE. The exact percentile runs
    // over INTEGER CENTS (playbook rule 2 — no engine round() on an
    // interpolated double): order statistics are exact ints and the
    // q={.5,.9} interpolation fractions are exactly representable, so
    // the interpolated value is bit-identical across engines.
    "a11_approx_quantile" -> ((s, d) =>
      lineitem(s, d)
        .withColumn("qc", round(col("l_quantity") * 100).cast("long"))
        .groupBy(col("l_returnflag"))
        .agg(
          (expr("percentile(qc, 0.5)") / lit(100.0)).as("p50"),
          (expr("percentile(qc, 0.9)") / lit(100.0)).as("p90"),
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("ap50"),
          expr("approx_percentile(l_quantity, 0.9, 10000)").as("ap90"))
        .select(col("l_returnflag"), col("p50"), col("p90"),
          (abs(col("ap50") - col("p50")) <= 1.0).as("p50_ok"),
          (abs(col("ap90") - col("p90")) <= 1.0).as("p90_ok"))),

    // HLL approx-distinct — the 100 TB path for A1/A2-style distincts
    // (single pass, fixed memory, no exact-distinct shuffle). Sketch
    // internals differ per engine, so the gate checks the ESTIMATE
    // against the exact count within the HLL error bound (±5% at the
    // default rsd 0.05): the output carries the exact counts plus
    // within-tolerance booleans, and the oracle computes the exact
    // counts with literal TRUE flags — hash-comparable, yet the HLL
    // sketch path is genuinely executed and accuracy-gated.
    "a10_approx_distinct" -> ((s, d) =>
      lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        approx_count_distinct(col("l_partkey")).as("apx_part"),
        approx_count_distinct(col("l_suppkey")).as("apx_supp"))
      .select(col("nd_part"), col("nd_supp"),
        (abs(col("apx_part") - col("nd_part")).cast("double")
          <= col("nd_part") * lit(0.05)).as("part_ok"),
        (abs(col("apx_supp") - col("nd_supp")).cast("double")
          <= col("nd_supp") * lit(0.05)).as("supp_ok"))),

    // x16: the versioned clustered-fact lifecycle, oracle-gated end to
    // end — clusterBuild half the fact range-clustered on the ship
    // date, clusterAppend the other half, re-cluster the live set via
    // the manifest flip (compactClusteredGenerations, vacuum
    // included), then serve a date-range aggregation THROUGH the
    // manifest read. The oracle is the same aggregation over the
    // original table: build/append/flip/vacuum must be content-
    // invisible, and the clustered layout's row-group skipping on the
    // pushed date predicate comes free (spec-measured in
    // ArtifactManifestSpec; the oracle here pins the values).
    // Aggregates are order-independent-exact (integer-valued quantity
    // sum, count, min/max) so double summation order cannot drift.
    "x16_clustered_fact" -> ((s, d) => {
      import graft.operators.{ArtifactManifest, TempArtifacts}
      val dir = TempArtifacts.dir("graft-clusterfact")
      val li = lineitem(s, d)
      ArtifactManifest.clusterBuild(
        li.filter(pmod(col("l_orderkey"), lit(2)) === 0), dir,
        Seq("l_shipdate"), 8)
      ArtifactManifest.clusterAppend(
        li.filter(pmod(col("l_orderkey"), lit(2)) === 1), dir,
        Seq("l_shipdate"), 8)
      ArtifactManifest.compactClusteredGenerations(s, dir,
        Seq("l_shipdate"), 8)
      ArtifactManifest.frame(s, dir).drop("ingest")
        .filter(col("l_shipdate").between("1994-01-01", "1994-12-31"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
    }),

    // x17: COPY-ON-WRITE partitioned CDC versioning, oracle-gated end
    // to end — the 100 TB successor of the full-snapshot chain
    // ([[PartitionedCdc]]): the base lays out as bucketed version 0,
    // each changelog generation applies as one batch that reads and
    // rewrites ONLY its churned buckets under a new version directory,
    // and the manifest-assembled final read must equal the one-shot
    // latest-wins apply — x11's oracle VERBATIM, the same equivalence
    // st12 holds for the streaming chain. Works because per-bucket
    // apply composes: a key's rows live in exactly one bucket, so
    // restricting each batch to churned buckets loses nothing.
    "x17_cdc_partitioned" -> ((s, d) => {
      import graft.operators.{PartitionedCdc, TempArtifacts}
      val (base, log) = cdcFrames(s, d)
      val root = TempArtifacts.dir("graft-pcdc")
      val bucketOf = pmod(col("o_orderkey"), lit(16)).cast("long")
      PartitionedCdc.init(base, bucketOf, root)
      for (g <- Seq(1, 2))
        PartitionedCdc.applyBatch(s, root,
          log.filter(col("seq") === g), Seq("o_orderkey"), "seq",
          "op", bucketOf, retainVersions = 10)
      PartitionedCdc.read(s, root)
    }),

    // x18: the MAINTAINED VIEW over the copy-on-write layout — x12's
    // incremental aggregate maintenance with the base COW-bucketed
    // ([[PartitionedCdc.maintainVersion]]): each batch's maintenance
    // job reads ONLY the churned buckets of the pre-batch version
    // (maintainAggs touches the base solely via the churn-keyed
    // semi-join, and a churn key's rows live in a churned bucket by
    // definition), and the group-sized aggregate versions whole. The
    // final aggregate version must hash-match the full recompute over
    // the applied snapshot — x12's oracle verbatim.
    "x18_cow_incr_agg" -> ((s, d) => {
      import graft.operators.{PartitionedCdc, TempArtifacts}
      val (b, l) = incrAggFrames(s, d)
      val root = TempArtifacts.dir("graft-pcdc-mv")
      val bucketOf = pmod(col("o_orderkey"), lit(16)).cast("long")
      PartitionedCdc.initMaintained(b, bucketOf, root,
        dims = Seq("grp"), sumCols = Seq("price_tc"))
      for (g <- Seq(1, 2))
        PartitionedCdc.maintainVersion(s, root,
          l.filter(col("seq") === g), Seq("o_orderkey"), "seq", "op",
          bucketOf, Seq("grp"), Seq("price_tc"), fromVersion = g - 1,
          retainVersions = 10)
      PartitionedCdc.readAggVersion(s, root, 2)
    }),

    // x15: data-quality constraint report — the pre-publication gate a
    // pipeline runs over a fact table (deequ-style): null checks,
    // range checks, set membership, PK uniqueness, FK referential
    // integrity. All scalar constraints + the uniqueness count fold
    // into ONE aggregation pass over the fact (the distinct-pair count
    // rides the same job via expand); referential integrity is one
    // anti-join count against the dim keys. Output: one row per
    // constraint with its violation count — integer-exact, so the
    // report is oracle-gated, not merely spec'd.
    "x15_dq_report" -> ((s, d) => {
      val li = lineitem(s, d)
      def viol(c: org.apache.spark.sql.Column) =
        sum(when(c, 1L).otherwise(0L))
      val scalar = li.agg(
        viol(col("l_quantity").isNull).as("c_null_qty"),
        viol(col("l_quantity") <= 0 || col("l_quantity") > 60)
          .as("c_range_qty"),
        viol(col("l_extendedprice") <= 0).as("c_range_price"),
        viol(col("l_returnflag").isNotNull &&
          !col("l_returnflag").isin("A", "N", "R")).as("c_set_flag"),
        // distinct over a STRUCT, not the bare pair: countDistinct
        // skips any tuple containing a NULL, so a unique null-PK row
        // would count as a "duplicate" — and diverge from the
        // oracle's row-value count(DISTINCT (a,b)), which (like the
        // struct) treats (k, NULL) as a value. DQ reports exist for
        // exactly this dirty data.
        (count(lit(1)) - countDistinct(struct(col("l_orderkey"),
          col("l_linenumber")))).as("c_pk_dup"))
        .selectExpr("""stack(5,
          'c_null_qty', c_null_qty,
          'c_range_qty', c_range_qty,
          'c_range_price', c_range_price,
          'c_set_flag', c_set_flag,
          'c_pk_dup', c_pk_dup) as (check_name, violations)""")
      val orphan = li
        .join(orders(s, d).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("c_fk_orphan").as("check_name"), col("violations"))
      scalar.unionByName(orphan)
    }),

    // a12: incremental cardinality via mergeable HLL sketches (Spark's
    // DataSketches hll_sketch_agg/hll_union_agg built-ins) — the
    // append-only pattern: each ingest batch keeps a sketch ARTIFACT,
    // corpus cardinality is the union of batch sketches, never a
    // rescan of old batches. Deterministic halves of lineitem stand in
    // for batches. The pinned invariant is PARTITION-COUNT INVARIANCE
    // of the unioned estimate (2-way union ≡ 4-way union, exactly):
    // registers are per-slot maxima, so any batching yields identical
    // union state. (A never-unioned sketch is NOT comparable — its HIP
    // estimator is presentation-order-dependent and invalidated by
    // union — so the single-pass estimate is held only to the same 5%
    // band as the exact count, a10-style.)
    "a12_hll_incremental" -> ((s, d) => {
      val li = lineitem(s, d)
      def unionEst(ways: Int) = li
        .groupBy(pmod(col("l_orderkey"), lit(ways)).as("b"))
        .agg(expr("hll_sketch_agg(l_partkey, 12)").as("sk"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      val exact = li.agg(
        countDistinct(col("l_partkey")).as("nd_part"))
      exact
        .crossJoin(unionEst(2).select(col("est").as("e2")))
        .crossJoin(unionEst(4).select(col("est").as("e4")))
        .select(col("nd_part"),
          (col("e2") === col("e4")).as("merge_invariant"),
          (abs(col("e2") - col("nd_part")).cast("double")
            <= col("nd_part") * lit(0.05)).as("apx_ok"))
    }),

    // x11: CDC changelog application — the next snapshot from a base
    // plus a two-generation keyed changelog (upserts, re-updates, and
    // deletes), latest seq wins per key ([[CdcOps.applyChangelog]]:
    // one max_by aggregation, no window sort; base joins the
    // collapsed keys once). The changelog derives deterministically
    // from `orders`: gen-1 re-prices keys %10 < 5 (×1.05), gen-2
    // re-prices keys %10 < 3 again (×1.10) or deletes every third of
    // them — so the result exercises base-untouched rows, once- and
    // twice-changed keys, pure inserts (keys outside the base), and
    // deletes. Prices stay RAW double products (one IEEE multiply is
    // bit-identical on both engines; a round() here would sit on the
    // .xx5 boundary trap).
    "x11_cdc_apply" -> ((s, d) => {
      val (base, log) = cdcFrames(s, d)
      CdcOps.applyChangelog(base, log,
        keys = Seq("o_orderkey"), seqCol = "seq", opCol = "op")
    }),

    // x12: incremental aggregate maintenance — the materialized-view
    // delta update ([[CdcOps.maintainAggs]]): the previous per-group
    // aggregate plus the changelog produce the next aggregate while
    // the base is touched only by a churn-keyed semi-join (never
    // re-aggregated). The measure is integer-scaled (price in
    // hundredths of a cent) so subtraction-based maintenance is
    // EXACT and the oracle — a full recompute over the applied
    // snapshot — must hash-match, proving maintain(agg(base), log)
    // ≡ agg(apply(base, log)). Groups: o_custkey % 100.
    "x12_incr_agg" -> ((s, d) => {
      val (b, l) = incrAggFrames(s, d)
      val prevAgg = b.groupBy("grp")
        .agg(sum("price_tc").as("price_tc"), count(lit(1)).as("n"))
      CdcOps.maintainAggs(prevAgg, b, l,
        keys = Seq("o_orderkey"), seqCol = "seq", opCol = "op",
        dims = Seq("grp"), sumCols = Seq("price_tc"))
    }),

    // x14: group-pruned recompute maintenance — min/max (and any
    // non-subtraction-invertible aggregate) under the same changelog
    // ([[CdcOps.maintainByRecompute]]): only the groups the changelog
    // touches re-aggregate (keys %10 < 5 → groups {0..4}); groups
    // {5..9} carry over from the previous view untouched. A delete
    // can remove a group's current extreme, which is exactly why
    // subtraction can't maintain these — the oracle recomputes over
    // the applied snapshot and must hash-match.
    "x14_incr_minmax" -> ((s, d) => {
      val (base, log) = cdcFrames(s, d)
      val kg = pmod(col("o_orderkey"), lit(10)).as("kgrp")
      val tc = round(col("price") * 10000).cast("long").as("price_tc")
      val b = base.select(col("o_orderkey"), kg, tc)
      val l = log.select(col("o_orderkey"), col("seq"), col("op"),
        kg, tc)
      def aggFn(rows: DataFrame): DataFrame = rows.groupBy("kgrp")
        .agg(min("price_tc").as("mn"), max("price_tc").as("mx"),
          count(lit(1)).as("n"))
      CdcOps.maintainByRecompute(aggFn(b), b, l,
        keys = Seq("o_orderkey"), seqCol = "seq", opCol = "op",
        dims = Seq("kgrp"), aggFn)
    }),

    // x13: snapshot version diff — the time-travel audit view
    // ([[CdcOps.snapshotDiff]]): what generation 2 of the changelog
    // DID to the table, computed as the keyed full-outer diff of two
    // successive snapshot versions (v1 = gen-1 applied, v2 = gen-2
    // applied on v1 — the same versions streamApply retains on
    // disk). Emits only changed keys: 'C' re-prices and 'R'
    // takedowns here; the 'A' class is spec-covered.
    "x13_snapshot_diff" -> ((s, d) => {
      val (base, log) = cdcFrames(s, d)
      val keys = Seq("o_orderkey")
      val v1 = CdcOps.applyChangelog(base,
        log.filter(col("seq") === 1), keys, "seq", "op")
      val v2 = CdcOps.applyChangelog(v1,
        log.filter(col("seq") === 2), keys, "seq", "op")
      CdcOps.snapshotDiff(v1, v2, keys)
    }),

    // x19: the version diff over the COPY-ON-WRITE layout
    // ([[PartitionedCdc.diffVersions]]) — x13's audit view, but
    // manifest-pruned: only the buckets whose serving directory
    // differs between the two manifests are listed or read (a bucket
    // both versions serve from the same immutable directory cannot
    // contribute a diff row), so the diff costs O(churn between the
    // versions), not O(base) twice. Held to x13's oracle VERBATIM —
    // bucket pruning must lose nothing.
    "x19_cow_diff" -> ((s, d) => {
      import graft.operators.{PartitionedCdc, TempArtifacts}
      val (base, log) = cdcFrames(s, d)
      val root = TempArtifacts.dir("graft-pcdc-diff")
      val bucketOf = pmod(col("o_orderkey"), lit(16)).cast("long")
      PartitionedCdc.init(base, bucketOf, root)
      for (g <- Seq(1, 2))
        PartitionedCdc.applyBatch(s, root,
          log.filter(col("seq") === g), Seq("o_orderkey"), "seq",
          "op", bucketOf, retainVersions = 10)
      PartitionedCdc.diffVersions(s, root, 1, 2, Seq("o_orderkey"))
    })
  )

  /** x11/st12's shared inputs: the base snapshot and the
    * two-generation changelog derived from `orders` — ONE definition
    * so the streaming apply is held to exactly the batch gate's data.
    */
  private[graft] def cdcFrames(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val o = orders(s, d)
    val base = o.filter(col("o_orderkey") % 10 >= 3)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").as("price"), lit("base").as("src"))
    val gen1 = o.filter(col("o_orderkey") % 10 < 5)
      .select(col("o_orderkey"), col("o_custkey"),
        lit(1L).as("seq"), lit("U").as("op"),
        (col("o_totalprice") * 1.05).as("price"),
        lit("cdc").as("src"))
    val gen2 = o.filter(col("o_orderkey") % 10 < 3)
      .select(col("o_orderkey"), col("o_custkey"),
        lit(2L).as("seq"),
        when(col("o_orderkey") % 3 === 0, "D").otherwise("U").as("op"),
        (col("o_totalprice") * 1.10).as("price"),
        lit("cdc").as("src"))
    (base, gen1.unionByName(gen2))
  }

  /** x12/st14's shared inputs: [[cdcFrames]] projected to the
    * maintenance shape — group key `grp` = o_custkey % 100 and the
    * measure integer-scaled to hundredths of a cent (`price_tc`) so
    * subtraction-based maintenance is exact. ONE definition so the
    * streaming maintenance is held to exactly the batch gate's data.
    */
  private[graft] def incrAggFrames(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val (base, log) = cdcFrames(s, d)
    val grp = pmod(col("o_custkey"), lit(100)).as("grp")
    val tc = round(col("price") * 10000).cast("long").as("price_tc")
    (base.select(col("o_orderkey"), grp, tc),
      log.select(col("o_orderkey"), col("seq"), col("op"), grp, tc))
  }

  /** x11 and x17 share one oracle: the partitioned copy-on-write
    * apply must land on exactly the one-shot latest-wins apply's
    * final state.
    */
  private val cdcApplySql =
    """WITH base AS (
         SELECT o_orderkey, o_custkey, o_totalprice AS price,
           'base' AS src
         FROM orders WHERE o_orderkey % 10 >= 3),
       log AS (
         SELECT o_orderkey, o_custkey, 1 AS seq, 'U' AS op,
           o_totalprice * 1.05 AS price, 'cdc' AS src
         FROM orders WHERE o_orderkey % 10 < 5
         UNION ALL
         SELECT o_orderkey, o_custkey, 2 AS seq,
           CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS op,
           o_totalprice * 1.10 AS price, 'cdc' AS src
         FROM orders WHERE o_orderkey % 10 < 3),
       latest AS (
         SELECT o_orderkey, o_custkey, op, price, src FROM (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
             ORDER BY seq DESC) AS rn
           FROM log) WHERE rn = 1)
       SELECT b.o_orderkey, b.o_custkey, b.price, b.src
       FROM base b LEFT JOIN latest l ON l.o_orderkey = b.o_orderkey
       WHERE l.o_orderkey IS NULL
       UNION ALL
       SELECT o_orderkey, o_custkey, price, src
       FROM latest WHERE op <> 'D'"""

  /** x12 and x18 share one oracle: the full recompute over the
    * applied snapshot — the equivalence incremental maintenance must
    * hash-match, whether the base is flat (x12) or COW-bucketed (x18).
    */
  private val incrAggSql =
    """WITH base AS (
         SELECT o_orderkey, o_custkey, o_totalprice AS price
         FROM orders WHERE o_orderkey % 10 >= 3),
       log AS (
         SELECT o_orderkey, o_custkey, 1 AS seq, 'U' AS op,
           o_totalprice * 1.05 AS price
         FROM orders WHERE o_orderkey % 10 < 5
         UNION ALL
         SELECT o_orderkey, o_custkey, 2 AS seq,
           CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS op,
           o_totalprice * 1.10 AS price
         FROM orders WHERE o_orderkey % 10 < 3),
       latest AS (
         SELECT o_orderkey, o_custkey, op, price FROM (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
             ORDER BY seq DESC) AS rn
           FROM log) WHERE rn = 1),
       applied AS (
         SELECT b.o_orderkey, b.o_custkey, b.price
         FROM base b LEFT JOIN latest l ON l.o_orderkey = b.o_orderkey
         WHERE l.o_orderkey IS NULL
         UNION ALL
         SELECT o_orderkey, o_custkey, price
         FROM latest WHERE op <> 'D')
       SELECT o_custkey % 100 AS grp,
         CAST(sum(CAST(round(price * 10000, 0) AS BIGINT)) AS BIGINT)
           AS price_tc,
         count(*) AS n
       FROM applied GROUP BY 1"""

  def oracle: Map[String, String] = Map(
    "p10_key_select" ->
      """SELECT event_id, user_id, value FROM events
         WHERE event_id IN
           (SELECT x * 197 + 11 FROM range(0, 50) t(x))""",
    "f6_pretty_sentinel" ->
      """WITH m AS (
           SELECT event_id, value,
             abs(CAST(round(value * 1000000, 0) AS BIGINT)) AS au
           FROM events),
         f AS (
           SELECT event_id, value, au,
             regexp_replace(lpad(CAST(au % 1000000 AS VARCHAR), 6, '0'),
                            '0+$', '') AS frac
           FROM m)
         SELECT event_id,
           CASE WHEN value = floor(value)
                THEN CAST(CAST(value AS BIGINT) AS VARCHAR)
                ELSE (CASE WHEN value < 0 THEN '-' ELSE '' END)
                     || CAST(au // 1000000 AS VARCHAR)
                     || (CASE WHEN frac = '' THEN ''
                         ELSE '.' || frac END)
           END AS value_str
         FROM f""",
    "f12_rekey_catalog" ->
      """SELECT user_id, 1::BIGINT AS qc_level,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS begin_ts,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_ts,
         count(*) AS n
         FROM events GROUP BY user_id""",
    "a8_percentiles" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 4) AS p50,
         round(quantile_cont(l_quantity, 0.9), 4) AS p90,
         round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
         FROM lineitem GROUP BY l_returnflag""",
    "x4_hash_split" ->
      """WITH b AS (
           SELECT lang,
             ('0x' || substr(md5('split|' || doc_id), 1, 15))::BIGINT % 100
               AS bucket
           FROM documents)
         SELECT lang,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n
         FROM b GROUP BY 1, 2""",
    "x5_stratified_sample" ->
      """WITH b AS (
           SELECT lang,
             CASE WHEN ('0x' || substr(md5('strat|' || doc_id), 1, 15))
                    ::BIGINT % 100
                  < (CASE WHEN lang = 'en' THEN 50
                          WHEN lang = 'de' THEN 30 ELSE 10 END)
                  THEN 1 ELSE 0 END AS keep
           FROM documents)
         SELECT lang, CAST(sum(keep) AS BIGINT) AS kept, count(*) AS total
         FROM b GROUP BY lang""",
    "x6_seq_pack" ->
      """WITH t AS (
           SELECT lang, doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS toks
           FROM documents),
         p AS (
           SELECT lang, toks,
             coalesce(sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prefix
           FROM t)
         SELECT lang, CAST(floor(prefix / 2048) AS BIGINT) AS bin,
           count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS sum_toks
         FROM p GROUP BY lang, bin""",
    "x7_source_mix" ->
      """WITH c AS (SELECT source, count(*) AS c FROM documents
                    GROUP BY source),
         i AS (SELECT source, c,
                 CAST(floor(sqrt(CAST(c AS DOUBLE))) AS BIGINT) AS isq
               FROM c),
         t AS (SELECT sum(isq) AS tot FROM i),
         -- no re-join on source: an equality join would drop a NULL
         -- source group the engine's quotas() keeps
         q AS (SELECT source, least((100 * isq) // tot, c) AS n_s
               FROM i CROSS JOIN t),
         r AS (SELECT source, doc_id,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY ('0x' || substr(md5('mix|' || doc_id), 1, 15))
                     ::BIGINT, doc_id) AS BIGINT) AS r
               FROM documents)
         SELECT r.source, r.doc_id, r.r
         FROM r JOIN q ON r.source IS NOT DISTINCT FROM q.source
         WHERE r.r <= q.n_s""",
    // exact 128-bit threshold comparison: hash*c < n_s*2^60 in HUGEINT,
    // mirroring the Spark side's decimal(19+14) arithmetic bit-for-bit
    "x9_threshold_mix" ->
      """WITH c AS (SELECT source, count(*) AS c FROM documents
                    GROUP BY source),
         i AS (SELECT source, c,
                 CAST(floor(sqrt(CAST(c AS DOUBLE))) AS BIGINT) AS isq
               FROM c),
         t AS (SELECT sum(isq) AS tot FROM i),
         q AS (SELECT source, c, least((100 * isq) // tot, c) AS n_s
               FROM i CROSS JOIN t),
         h AS (SELECT source, doc_id,
                 ('0x' || substr(md5('mix|' || doc_id), 1, 15))::BIGINT
                   AS h
               FROM documents)
         SELECT h.source, count(*) AS n
         FROM h JOIN q ON h.source IS NOT DISTINCT FROM q.source
         WHERE h.h::HUGEINT * q.c::HUGEINT
             < q.n_s::HUGEINT * 1152921504606846976::HUGEINT
         GROUP BY h.source""",
    "j8_bloom_join" ->
      """SELECT l_returnflag, count(*) AS cnt,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
           AS sum_price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'
         GROUP BY l_returnflag""",
    "x3_interval_join" ->
      """SELECT p.event_id, p.user_id, count(c.ts) AS clicks_5m
         FROM (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT user_id, ts FROM events
               WHERE event_type = 'click') c
           ON p.user_id = c.user_id
          AND epoch_us(c.ts) > epoch_us(p.ts) - 300000000
          AND epoch_us(c.ts) <= epoch_us(p.ts)
         GROUP BY p.event_id, p.user_id""",
    "x2_salted_agg" ->
      """SELECT event_type,
         sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS sum_v,
         count(*) AS cnt
         FROM events GROUP BY event_type""",
    "x1_asof_join" ->
      """WITH r AS (
           SELECT user_id, ts, max(value) AS click_value FROM events
           WHERE event_type = 'click' GROUP BY user_id, ts),
         l AS (
           SELECT event_id, user_id, ts, value FROM events
           WHERE event_type = 'purchase')
         SELECT l.event_id, l.user_id, l.value, r.click_value
         FROM l ASOF LEFT JOIN r
           ON l.user_id = r.user_id AND l.ts >= r.ts""",
    "w9_range_window" ->
      """SELECT event_id, user_id,
         sum(CAST(round(value * 100, 0) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) / 100.0
           AS hour_sum
         FROM events""",
    "a9_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0
           AS sum_price
         FROM orders
         GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    "a11_approx_quantile" ->
      """SELECT l_returnflag,
         quantile_cont(CAST(round(l_quantity * 100, 0) AS BIGINT), 0.5)
           / 100.0 AS p50,
         quantile_cont(CAST(round(l_quantity * 100, 0) AS BIGINT), 0.9)
           / 100.0 AS p90,
         true AS p50_ok, true AS p90_ok
         FROM lineitem GROUP BY l_returnflag""",
    // Exact counts + literal tolerance flags: the Spark side asserts its
    // HLL estimate is within ±5% of exact, so a drifting sketch fails
    // the hash compare instead of hiding behind a rows-only gate.
    "a12_hll_incremental" ->
      """SELECT count(DISTINCT l_partkey) AS nd_part,
         true AS merge_invariant, true AS apx_ok
         FROM lineitem""",
    // the artifact's content must equal the original table, so the
    // oracle aggregates the table directly — any row lost, duplicated,
    // or altered by build/append/flip/vacuum breaks the hash match
    "x16_clustered_fact" ->
      """SELECT l_returnflag,
           sum(l_quantity) AS sum_qty,
           count(*) AS n,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
         FROM lineitem
         WHERE l_shipdate BETWEEN '1994-01-01' AND '1994-12-31'
         GROUP BY l_returnflag""",
    "x15_dq_report" ->
      """SELECT 'c_null_qty' AS check_name,
           CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS violations FROM lineitem
         UNION ALL
         SELECT 'c_range_qty',
           CAST(sum(CASE WHEN l_quantity <= 0 OR l_quantity > 60
                    THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
         UNION ALL
         SELECT 'c_range_price',
           CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT) FROM lineitem
         UNION ALL
         SELECT 'c_set_flag',
           CAST(sum(CASE WHEN l_returnflag IS NOT NULL
                    AND l_returnflag NOT IN ('A','N','R')
                    THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
         UNION ALL
         SELECT 'c_pk_dup',
           count(*) - count(DISTINCT (l_orderkey, l_linenumber))
           FROM lineitem
         UNION ALL
         SELECT 'c_fk_orphan', count(*)
           FROM lineitem l LEFT JOIN orders o
             ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderkey IS NULL""",
    "a10_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS nd_part,
         count(DISTINCT l_suppkey) AS nd_supp,
         true AS part_ok, true AS supp_ok
         FROM lineitem""",
    // Latest-wins mirror via row_number over seq DESC (seqs are unique
    // per key by construction, so the pick is deterministic); the
    // untouched-base leg is the anti-join's NULL-probe form.
    "x11_cdc_apply" -> cdcApplySql,
    // the partitioned copy-on-write apply is held to the SAME final
    // state as the one-shot apply — per-bucket application composes
    "x17_cdc_partitioned" -> cdcApplySql,
    // Full recompute over the applied snapshot — the equivalence the
    // incremental maintenance must hash-match. Measures integer-scale
    // BEFORE summing (hundredths of a cent), exactly as the Spark
    // side's per-row scaling, so both sums are exact integers.
    "x12_incr_agg" -> incrAggSql,
    // the COW-maintained view is held to the SAME recompute oracle:
    // per-bucket maintenance composes exactly like per-bucket apply
    "x18_cow_incr_agg" -> incrAggSql,
    // Full recompute over the applied snapshot — x14's equivalence
    // target (min/max CANNOT be maintained by subtraction; the op
    // re-aggregates touched groups only, which must equal this).
    "x14_incr_minmax" ->
      """WITH base AS (
           SELECT o_orderkey, o_custkey, o_totalprice AS price
           FROM orders WHERE o_orderkey % 10 >= 3),
         log AS (
           SELECT o_orderkey, o_custkey, 1 AS seq, 'U' AS op,
             o_totalprice * 1.05 AS price
           FROM orders WHERE o_orderkey % 10 < 5
           UNION ALL
           SELECT o_orderkey, o_custkey, 2 AS seq,
             CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS op,
             o_totalprice * 1.10 AS price
           FROM orders WHERE o_orderkey % 10 < 3),
         latest AS (
           SELECT o_orderkey, op, price FROM (
             SELECT *, row_number() OVER (PARTITION BY o_orderkey
               ORDER BY seq DESC) AS rn
             FROM log) WHERE rn = 1),
         applied AS (
           SELECT b.o_orderkey, b.price
           FROM base b LEFT JOIN latest l ON l.o_orderkey = b.o_orderkey
           WHERE l.o_orderkey IS NULL
           UNION ALL
           SELECT o_orderkey, price
           FROM latest WHERE op <> 'D')
         SELECT o_orderkey % 10 AS kgrp,
           min(CAST(round(price * 10000, 0) AS BIGINT)) AS mn,
           max(CAST(round(price * 10000, 0) AS BIGINT)) AS mx,
           count(*) AS n
         FROM applied GROUP BY 1""",
    // v1 = generation 1 applied, v2 = generation 2 applied on v1;
    // the diff emits only keys the second generation touched, with
    // old/new payload side by side (nulls on the absent side).
    "x13_snapshot_diff" -> snapshotDiffSql,
    // the bucket-pruned COW diff is held to the SAME full diff —
    // manifest pruning must lose nothing
    "x19_cow_diff" -> snapshotDiffSql
  )

  // lazy: referenced by the oracle map declared ABOVE this definition
  // (a strict val would still be null when the map initializes)
  private lazy val snapshotDiffSql =
      """WITH base AS (
           SELECT o_orderkey, o_custkey, o_totalprice AS price,
             'base' AS src
           FROM orders WHERE o_orderkey % 10 >= 3),
         g1 AS (
           SELECT o_orderkey, o_custkey,
             o_totalprice * 1.05 AS price, 'cdc' AS src
           FROM orders WHERE o_orderkey % 10 < 5),
         g2 AS (
           SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS op,
             o_totalprice * 1.10 AS price, 'cdc' AS src
           FROM orders WHERE o_orderkey % 10 < 3),
         v1 AS (
           SELECT b.o_orderkey, b.o_custkey, b.price, b.src
           FROM base b LEFT JOIN g1 ON g1.o_orderkey = b.o_orderkey
           WHERE g1.o_orderkey IS NULL
           UNION ALL
           SELECT o_orderkey, o_custkey, price, src FROM g1),
         v2 AS (
           SELECT v.o_orderkey, v.o_custkey, v.price, v.src
           FROM v1 v LEFT JOIN g2 ON g2.o_orderkey = v.o_orderkey
           WHERE g2.o_orderkey IS NULL
           UNION ALL
           SELECT o_orderkey, o_custkey, price, src
           FROM g2 WHERE op <> 'D')
         SELECT * FROM (
           SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
             CASE WHEN a.o_orderkey IS NULL THEN 'A'
                  WHEN b.o_orderkey IS NULL THEN 'R'
                  WHEN (a.o_custkey IS DISTINCT FROM b.o_custkey)
                    OR (a.price IS DISTINCT FROM b.price)
                    OR (a.src IS DISTINCT FROM b.src) THEN 'C'
             END AS change,
             a.o_custkey AS old_o_custkey, b.o_custkey AS new_o_custkey,
             a.price AS old_price, b.price AS new_price,
             a.src AS old_src, b.src AS new_src
           FROM v1 a FULL JOIN v2 b ON a.o_orderkey = b.o_orderkey)
         WHERE change IS NOT NULL"""
}
