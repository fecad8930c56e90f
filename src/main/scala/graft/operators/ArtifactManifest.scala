package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A MINIMAL manifest for the `(ingest, …)`-partitioned index
  * artifacts — the read-path half of artifact maintenance. Without it,
  * every reader lists the artifact directory, which couples readers to
  * the physical tree at exactly the moments maintenance mutates it:
  *  - [[LayoutOps.swapInto]] has a rename window where the directory
  *    is briefly absent or straddles old/new trees;
  *  - a crashed append leaves an uncommitted `ingest=` directory that
  *    a listing-based reader silently serves.
  *
  * The manifest inverts the dependency: each committed mutation writes
  * `_manifests/manifest-<version>.json` naming the LIVE generation set
  * (plus a content signature for change detection), and readers pin
  * the highest manifest version — uncommitted generations are
  * invisible, and [[compactGenerations]] here replaces the swap with
  * write-new-generation → flip-manifest-last → vacuum, so a reader
  * pinned to a pre-compaction manifest keeps serving its generation
  * set throughout the flip (spec-held — `ArtifactManifestSpec` pins
  * this, orphan invisibility, vacuum reaping, pruning, legacy
  * adoption, and append replay-idempotence; the old files survive
  * until [[vacuum]]). This is the manifest/version-file core of every
  * lakehouse table format, minus the parts a single-writer artifact
  * does not need (optimistic concurrency, schema evolution); when an
  * artifact ever needs concurrent WRITERS, a real transaction log is
  * the answer.
  *
  * Manifest versions are CREATE-NEW files (never overwritten):
  * visibility is one atomic rename, and the highest version wins.
  * Directory listing remains the documented FALLBACK for artifacts
  * predating the manifest (and after [[LayoutOps.swapInto]]-based
  * maintenance, which replaces the subtree wholesale and drops
  * `_manifests` — the fresh listing is then exactly the live set).
  * Same SINGLE-WRITER mutation contract as every artifact op.
  */
object ArtifactManifest {

  final case class Pin(version: Long, generations: Seq[Long],
      signature: String,
      genDigests: Map[Long, String] = Map.empty,
      schemaJson: Option[String] = None)

  private def fsOf(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** `_` prefix: Spark's file-source listing treats the directory as
    * hidden, so manifests never pollute the artifact's data scan.
    */
  private def manifestDir(dir: String) = new Path(dir, "_manifests")

  private[operators] def md5(x: String): String = java.security.MessageDigest
    .getInstance("MD5")
    .digest(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    .map("%02x".format(_)).mkString

  /** Stable listing digest of one generation subtree: every file's
    * path relative to `dir`, and its length. Driver-side metadata
    * only — bounded by the generation's file count, never a data read.
    *
    * Walked with [[listStatusWalk]], NOT `fs.listFiles(_, true)`:
    * this runs on every recordBuild/recordAppend — i.e. once per
    * streaming micro-batch — and listFiles materializes a
    * LocatedFileStatus per file, which on the local Hadoop adapter
    * without the native lib forks an `ls` PROCESS per file to read
    * permissions (measured on this box: 64 files, 310 ms listFiles
    * vs 4 ms listStatus walk — FsProbe). The walk needs only
    * path+length, which plain listStatus carries fork-free.
    */
  private def genListing(s: SparkSession, dir: String,
      gen: Long): String = {
    val gp = new Path(dir, s"ingest=$gen")
    val fs = fsOf(s, gp)
    if (!fs.exists(gp)) s"ingest=$gen:absent"
    else {
      val base = fs.makeQualified(new Path(dir)).toString + "/"
      listStatusWalk(fs, gp)
        .map(f => s"${f.getPath.toString.stripPrefix(base)}:${f.getLen}")
        .sorted.mkString("\n")
    }
  }

  /** Recursive FILE statuses under `p` via per-directory listStatus —
    * the fork-free local-adapter path (see [[genListing]]'s rationale;
    * `listFiles(_, true)` pays a forked `ls` per file there). On
    * remote stores this costs one LIST per directory instead of
    * listFiles' single flat LIST — the artifact trees are two levels
    * deep (`ingest=g/part=p/files`), so the request count stays
    * bounded by the partition count the walk touches anyway.
    */
  private[operators] def listStatusWalk(fs: FileSystem,
      p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(p).toSeq.flatMap { st =>
      if (st.isDirectory) listStatusWalk(fs, st.getPath) else Seq(st)
    }

  /** Raw listing text per generation — one metadata walk, shared by
    * [[fullSignature]] (digest of the join) and the per-generation
    * digest map (digest of each) so no caller lists a subtree twice.
    */
  private def rawListings(s: SparkSession, dir: String,
      gens: Seq[Long]): Map[Long, String] =
    gens.map(g => g -> genListing(s, dir, g)).toMap

  /** Name-INSENSITIVE content digest of one generation's listing: the
    * partition subpath and length of every file, with the file name
    * itself dropped. A legitimately replayed batch (dynamic-partition
    * overwrite of the same rows) rewrites byte-identical files under
    * FRESH task-attempt names — same sizes, same partition layout —
    * and must keep its committed digest; a diverged replay changes
    * sizes or layout and must not. (A divergence that preserves every
    * file's partition and compressed size would slip through — the
    * digest is a guard, not a content address.)
    */
  private def contentDigestOfListing(listing: String): String =
    md5(listing.split("\n").toSeq.map { line =>
      val i = line.lastIndexOf(':')
      val (p, len) = (line.take(i), line.drop(i))
      val slash = p.lastIndexOf('/')
      (if (slash >= 0) p.take(slash) else p) + len
    }.sorted.mkString("\n"))

  private def digestsOf(raw: Map[Long, String]): Map[Long, String] =
    raw.map { case (g, l) => g -> contentDigestOfListing(l) }

  private def fullSignatureOf(raw: Map[Long, String],
      gens: Seq[Long]): String =
    md5(gens.sorted.map(raw).mkString("\n\n"))

  /** Full content signature over a generation set. */
  private def fullSignature(s: SparkSession, dir: String,
      gens: Seq[Long]): String =
    fullSignatureOf(rawListings(s, dir, gens), gens)

  /** Highest committed manifest, if the artifact has any. */
  def latest(s: SparkSession, dir: String): Option[Pin] = {
    val md = manifestDir(dir)
    val fs = fsOf(s, md)
    if (!fs.exists(md)) return None
    val vs = fs.listStatus(md).map(_.getPath.getName).collect {
      case n if n.startsWith("manifest-") && n.endsWith(".json") &&
          n.stripPrefix("manifest-").stripSuffix(".json")
            .forall(_.isDigit) =>
        n.stripPrefix("manifest-").stripSuffix(".json").toLong
    }
    if (vs.isEmpty) return None
    val v = vs.max
    val in = fs.open(new Path(md, f"manifest-$v%020d.json"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(text)
    val gens = (j \ "generations") match {
      case JArray(xs) => xs.map {
        case JInt(i) => i.toLong
        case other => sys.error(
          s"ArtifactManifest: non-integer generation $other in " +
            s"manifest-$v of $dir")
      }
      case other => sys.error(
        s"ArtifactManifest: malformed generations $other in " +
          s"manifest-$v of $dir")
    }
    val sig = (j \ "signature") match {
      case JString(x) => x
      case _ => ""
    }
    // optional (absent in pre-round-10 manifests): per-generation
    // listing digests for replay change detection
    val digests = (j \ "genDigests") match {
      case JObject(fields) => fields.collect {
        case JField(k, JString(d)) if k.forall(_.isDigit) =>
          k.toLong -> d
      }.toMap
      case _ => Map.empty[Long, String]
    }
    // optional (absent in pre-round-13 manifests): the artifact's data
    // schema, so a committed-EMPTY live set (total takedown) can still
    // serve a zero-row frame instead of failing schema inference over
    // a fileless directory
    val schemaJson = (j \ "schema") match {
      case JString(x) => Some(x)
      case _ => None
    }
    Some(Pin(v, gens, sig, digests, schemaJson))
  }

  /** Commit a new manifest version: write to a temp name, rename into
    * place CREATE-NEW (an existing target means a second writer — fail
    * loudly rather than silently race), return the version. `prev` is
    * the caller's already-loaded pin (every mutation reads it anyway)
    * — re-listing here would double the driver-side metadata calls of
    * a per-micro-batch streaming append.
    */
  /** Newest-generation schema merged with the carried-forward pin's:
    * newest wins per field name, carried-only fields are appended (as
    * nullable — the newest generation has no values for them). The
    * merge keeps BOTH guarantees: additive evolution lands (a stamped
    * append on a pre-stamp artifact must not be frozen out by
    * carry-forward), and an old NARROW writer appending after
    * evolution cannot silently regress the stored shape — its commit
    * re-acquires the evolved fields from the carry.
    */
  private def mergeSchemaJson(newest: String, carried: String): String =
    if (newest == carried) newest
    else {
      import org.apache.spark.sql.types.{DataType, StructType}
      val n = DataType.fromJson(newest).asInstanceOf[StructType]
      val c = DataType.fromJson(carried).asInstanceOf[StructType]
      val have = n.fieldNames.toSet
      StructType(n.fields ++ c.fields.filterNot(f => have(f.name))
        .map(_.copy(nullable = true))).json
    }

  private def commit(s: SparkSession, dir: String, gens: Seq[Long],
      signature: String, prev: Option[Pin],
      genDigests: Map[Long, String] = Map.empty,
      knownSchemaJson: Option[String] = None,
      mergeCarried: Boolean = true): Long = {
    val md = manifestDir(dir)
    val fs = fsOf(s, md)
    fs.mkdirs(md)
    val v = prev.map(_.version + 1).getOrElse(0L)
    // the data schema rides every manifest, so the one moment it is
    // NEEDED — serving a committed-empty artifact (total takedown) as
    // a zero-row frame — it is already stored. Sources, cheapest
    // first:
    //  - the WRITE PATH's own schema (`knownSchemaJson` — every
    //    artifact mutation has the written DataFrame in hand, so this
    //    is free; the per-commit DataFrameReader inference it
    //    replaces cost the index lifecycle family 2-3x at sf0.1);
    //  - DataFrameReader inference over the NEWEST generation only,
    //    for callers that cannot pass a schema (legacy adoption of an
    //    externally-written tree) — one small listing + one footer;
    //  - the previous pin's stored schema (fileless commit).
    // The newest schema is MERGED with the carry-forward
    // ([[mergeSchemaJson]]) on EVOLVING commits (appends,
    // content-preserving compactions) — but a BUILD replaces it
    // outright (`mergeCarried = false`): a rebuild that legitimately
    // dropped a column must not carry the phantom field forever.
    val newestJson = knownSchemaJson.orElse {
      gens.sorted.lastOption.flatMap { g =>
        scala.util.Try(
          s.read.option("basePath", dir).parquet(s"$dir/ingest=$g")
            .schema.json).toOption
      }
    }
    val carried = prev.flatMap(_.schemaJson)
    val schemaJson = ((newestJson, carried) match {
      case (Some(n), Some(c)) if mergeCarried =>
        Some(mergeSchemaJson(n, c))
      case (n, c) => n.orElse(c)
    }).orElse(
      scala.util.Try(
        s.read.option("basePath", dir).parquet(dir).schema.json)
        .toOption)
    // digests are hex, keys numeric — safe to emit without escaping
    val digestJson = genDigests.toSeq.sortBy(_._1)
      .map { case (g, d) => s""""$g":"$d"""" }.mkString(",")
    // the schema json carries quotes — render through json4s so the
    // embedded string is escaped correctly
    val schemaField = schemaJson.map { sj =>
      s""","schema":${org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(org.json4s.JString(sj)))}"""
    }.getOrElse("")
    val json =
      s"""{"version":$v,"generations":[${gens.sorted.mkString(",")}],""" +
        s""""signature":"$signature","genDigests":{$digestJson}""" +
        schemaField + "}"
    val tmp = new Path(md, f".manifest-$v%020d.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fin = new Path(md, f"manifest-$v%020d.json")
    require(!fs.exists(fin) && fs.rename(tmp, fin),
      s"ArtifactManifest: manifest version $v already exists (or " +
        s"rename failed) at $dir — a concurrent writer violated the " +
        "single-writer contract")
    // keep a short history for post-mortems; prune the rest so
    // manifests never accumulate unboundedly. Stale dot-tmp files
    // (a crashed earlier commit died between create and rename) are
    // reaped too — the name filter used to skip them, so a flaky-FS
    // retry loop grew the directory without bound and slowed every
    // latest() listing. Safe under the single-writer contract: OUR
    // tmp was just renamed away, so any remaining tmp is dead.
    val old = fs.listStatus(md).map(_.getPath).filter { p =>
      val n = p.getName
      (n.startsWith("manifest-") && n.endsWith(".json") &&
        n.stripPrefix("manifest-").stripSuffix(".json")
          .forall(_.isDigit) &&
        n.stripPrefix("manifest-").stripSuffix(".json").toLong < v - 4) ||
      (n.startsWith(".manifest-") && n.endsWith(".json.tmp"))
    }
    old.foreach(fs.delete(_, false))
    v
  }

  /** Record a fresh BUILD: the live set is exactly the on-disk
    * listing (a build starts the artifact; there is nothing stale to
    * exclude). `knownSchemaJson` is the written frame's schema when
    * the caller has it — the commit then skips schema inference.
    */
  def recordBuild(s: SparkSession, dir: String,
      knownSchemaJson: Option[String] = None): Unit = {
    val gens = LayoutOps.ingestGenerations(s, dir)
    val raw = rawListings(s, dir, gens)
    // a build REPLACES the artifact — its schema replaces the pin's
    // (no merge): a rebuild that dropped a column must not carry it
    commit(s, dir, gens, fullSignatureOf(raw, gens), latest(s, dir),
      digestsOf(raw), knownSchemaJson, mergeCarried = false)
  }

  /** Record a committed APPEND of `gen`. The signature extends the
    * previous one incrementally (hash-chained with the new
    * generation's listing), so a per-batch streaming append pays one
    * small-directory listing, not a full artifact walk. Chained
    * signatures are a DISTINCT namespace from [[fullSignature]]'s
    * (same live set, different digest) — both serve change detection
    * (compare like with like), neither is a content address.
    *
    * Replay-idempotent: a replayed streaming batch (gen already live)
    * is a no-op — committing again would re-chain the same listing and
    * change the signature with unchanged content. The no-op is
    * GUARDED: the manifest stores each generation's name-insensitive
    * content digest ([[contentDigestOfListing]] — partition layout +
    * file sizes, so a faithful replay's fresh task-attempt file names
    * don't trip it), and a replay whose write produced DIFFERENT
    * content (clusterAppend overwrites the generation directory
    * before this call, so a diverged re-run would silently swap
    * content under a stale signature) fails loudly instead of
    * no-opping. Manifests written before the digest field existed
    * have no stored digest for old generations — those replays keep
    * the identical-content assumption undetected, matching the
    * streaming-batch contract. A ZERO-ROW
    * append is also a no-op: a dynamic-partition write that produced
    * no rows creates no `ingest=` directory (e.g. an ingest batch
    * whose every doc fell below the shingle threshold), and pinning
    * the absent path would make every subsequent [[frame]] read fail.
    */
  def recordAppend(s: SparkSession, dir: String, gen: Long,
      knownSchemaJson: Option[String] = None): Unit =
    latest(s, dir) match {
      case Some(p) if p.generations.contains(gen) =>
        p.genDigests.get(gen).foreach { stored =>
          val now = contentDigestOfListing(genListing(s, dir, gen))
          require(now == stored,
            s"recordAppend: generation $gen of $dir is already " +
              s"committed but its on-disk listing digest ($now) no " +
              s"longer matches the manifest's ($stored) — a replay " +
              "must rewrite byte-identical content; this one " +
              "diverged, and no-opping would serve swapped content " +
              "under a stale signature")
        }
      case Some(p) =>
        val fs = fsOf(s, new Path(dir))
        if (fs.exists(new Path(dir, s"ingest=$gen"))) {
          val listing = genListing(s, dir, gen)
          commit(s, dir, (p.generations :+ gen).distinct,
            md5(p.signature + "\n\n" + listing), Some(p),
            p.genDigests + (gen -> contentDigestOfListing(listing)),
            knownSchemaJson)
        }
      case None =>
        // legacy artifact (predates manifests): adopt the listing
        recordBuild(s, dir, knownSchemaJson)
    }

  /** Re-derive the live set after a TAKEDOWN
    * ([[LayoutOps.deleteKeysPartitioned]] can empty whole
    * generations): previous set ∩ still-existing directories — never
    * the raw listing, which would resurrect uncommitted generations a
    * crashed append left behind.
    */
  def refreshAfterDelete(s: SparkSession, dir: String): Unit =
    latest(s, dir).foreach { p =>
      val live = LayoutOps.ingestGenerations(s, dir).toSet
      val gens = p.generations.filter(live)
      // the takedown rewrote files in place — every surviving
      // generation's digest must be recomputed, not carried over. The
      // SCHEMA, by contrast, is exactly the previous pin's: a
      // takedown deletes rows, never evolves the shape — so the
      // stored schema rides through with no inference
      val raw = rawListings(s, dir, gens)
      commit(s, dir, gens, fullSignatureOf(raw, gens), Some(p),
        digestsOf(raw), p.schemaJson)
    }

  /** The artifact's data as of the latest manifest: ONLY the listed
    * generation directories are read (uncommitted appends are
    * invisible; files a deferred [[vacuum]] has not yet reaped are
    * excluded). A manifest whose live set is EMPTY (a takedown emptied
    * every generation) serves zero rows — never the raw listing, which
    * would resurrect a crashed append's uncommitted orphan, exactly
    * the data the manifest exists to hide. Only an artifact with NO
    * manifest at all gets the plain directory read (legacy behavior).
    */
  def frame(s: SparkSession, dir: String): DataFrame =
    liveFrame(s, dir)

  /** [[frame]] plus the manifest PIN it was read at (`None` for a
    * tree with no manifest) — ONE `latest()` read, so the pin can
    * never drift from the generation set the frame serves. Two
    * consumers thread it onward: (1) the ADC recall report stamps
    * the pin's VERSION rather than re-reading `latest()` at stamp
    * time — a concurrent append between the frame read and the stamp
    * would otherwise stamp the report fresh for a corpus it never
    * measured; (2) the native set-push re-readers list the pin's
    * GENERATIONS rather than re-pinning at scan time — a tier that
    * re-pinned could serve a different generation set than the
    * frame the other tiers serve, making the tier choice
    * decision-visible under concurrent mutation.
    */
  def pinnedFrame(s: SparkSession, dir: String)
      : (Option[Pin], DataFrame) = {
    val pin = latest(s, dir)
    (pin, frameOfPin(s, dir, pin))
  }

  /** Physical bytes of the LIVE pinned generation set — the honest
    * cost-model input for the gates' pushdown decisions: a raw
    * content summary over a manifest-managed tree also counts
    * orphaned un-vacuumed generations and the `_manifests` metadata,
    * so a decision sized from it can flip on before the live data
    * warrants it. Trees without a manifest keep the whole-tree
    * summary (there is nothing better to measure).
    */
  def liveBytes(s: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    def bytes(path: org.apache.hadoop.fs.Path): Long =
      if (fs.exists(path)) fs.getContentSummary(path).getLength else 0L
    latest(s, dir) match {
      case Some(pin) => pin.generations.map(g =>
        bytes(new org.apache.hadoop.fs.Path(s"$dir/ingest=$g"))).sum
      case None => bytes(p)
    }
  }

  private def liveFrame(s: SparkSession, dir: String): DataFrame =
    frameOfPin(s, dir, latest(s, dir))

  private[operators] def frameOfPin(s: SparkSession, dir: String,
      pin: Option[Pin]): DataFrame =
    pin match {
      case Some(p) if p.generations.nonEmpty =>
        s.read.option("basePath", dir)
          .parquet(p.generations.sorted.map(g => s"$dir/ingest=$g"): _*)
      case Some(p) =>
        // committed-empty (a takedown emptied every generation): zero
        // rows in the STORED schema — a clean total takedown leaves
        // no parquet file to infer from, and bricking the artifact
        // until a rebuild would contradict the takedown contract
        // (serving-after-delete ≡ an index never containing the ids:
        // an empty index serves zero candidates, it does not crash).
        // Orphan files, when present, still donate the schema for
        // legacy manifests that predate the stored one.
        p.schemaJson match {
          case Some(sj) => s.createDataFrame(
            s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.DataType.fromJson(sj)
              .asInstanceOf[org.apache.spark.sql.types.StructType])
          case None =>
            s.read.option("basePath", dir).parquet(dir)
              .where(lit(false))
        }
      case None => s.read.parquet(dir)
    }

  /** Generation compaction under the manifest: collapse the LIVE
    * generation set into one NEW generation and flip the manifest —
    * the reader-safe successor of [[LayoutOps.compactGenerations]]'s
    * stage-and-swap (which renames the directory readers are inside).
    * Steps:
    *
    *  1. read the PINNED live set (a crashed append's uncommitted
    *     generation is not compacted in — it stays orphaned for
    *     [[vacuum]]);
    *  2. rewrite it as `ingest=<max(listing)+1>` — a brand-new
    *     directory, so no live reader's files are touched (numbering
    *     takes the LISTING max so an orphaned higher generation is
    *     never overwritten);
    *  3. commit the manifest naming only the new generation — the
    *     atomic flip: readers loading before it serve the old set
    *     (files still present), readers after it serve the collapsed
    *     one, and both see identical rows;
    *  4. [[vacuum]] (skippable with `vacuum = false` while readers
    *     may still hold pre-flip pins — run it after their lease).
    *
    * `sortWithin` re-sorts rows inside each rewritten file (see
    * [[LayoutOps.compactGenerations]]); the partition column leads
    * the sort so the partitioned write's required ordering is already
    * satisfied and its own (unstable) sort never runs. Returns the
    * surviving generation.
    */
  def compactGenerations(s: SparkSession, dir: String, partCol: String,
      filesPerPartition: Int = 1, sortWithin: Seq[String] = Nil,
      vacuum: Boolean = true, rangeFiles: Boolean = false): Long = {
    require(filesPerPartition >= 1,
      s"compactGenerations: filesPerPartition >= 1 " +
        s"(got $filesPerPartition)")
    // complete a crashed staged takedown first — its marked staging
    // tree holds pre-compaction partition copies that a later
    // recovery would wrongly adopt over the compacted tree (see
    // LayoutOps.deleteKeysPartitioned's recover-first rationale)
    LayoutOps.recoverStagedTakedown(s, dir, partCol)
    val listed = LayoutOps.ingestGenerations(s, dir)
    require(listed.nonEmpty,
      s"compactGenerations: $dir has no ingest= partitions — not a " +
        "built artifact")
    requireNotCommittedEmpty(s, dir, "compactGenerations")
    val newGen = listed.max + 1
    // the live frame is in hand for the rewrite anyway — its resolved
    // schema rides into the commit for free (no re-inference)
    val live = frame(s, dir)
    LayoutOps.writeGenerationPacked(live.drop("ingest"),
      partCol, filesPerPartition, sortWithin, s"$dir/ingest=$newGen",
      rangeFiles)
    val raw = rawListings(s, dir, Seq(newGen))
    commit(s, dir, Seq(newGen), fullSignatureOf(raw, Seq(newGen)),
      latest(s, dir), digestsOf(raw), Some(live.schema.json))
    if (vacuum) this.vacuum(s, dir)
    newGen
  }

  /** [[compactGenerations]] with the file layout SIZED from the live
    * store — the index gates' maintenance entry. Files per partition
    * = ceil(liveBytes / partitions / `graft.index.targetFileBytes`
    * (default 512 MiB)); past ONE file per partition the partition's
    * files are RANGE-split on the sort key (rangeFiles): hash packing
    * re-scatters every file across the full key space, so pushed
    * set-probes would degrade toward per-file-exposure × files the
    * moment a band outgrows one task's file, while disjoint range
    * slices keep rows-read per touched key ~page-sized at any file
    * count (the layout the native tier's 3.5× win was measured on).
    * Below the bar the proven 1-file-per-partition layout is kept —
    * the sized call is byte-identical to the old fixed call there.
    * Sort-less artifacts (no gate layout) size file COUNT the same
    * way but split by row hash — there is no key order to preserve.
    */
  def compactGenerationsSized(s: SparkSession, dir: String,
      partCol: String, sortWithin: Seq[String] = Nil,
      vacuum: Boolean = true): Long = {
    val target =
      Knobs.long(s, "graft.index.targetFileBytes", 512L << 20, min = 1)
    val bytes = liveBytes(s, dir)
    val nPart =
      math.max(1, LayoutOps.partitionValueCount(s, dir, partCol))
    val fpp = math.min(4096L,
      math.max(1L, (bytes / nPart + target - 1L) / target)).toInt
    compactGenerations(s, dir, partCol, filesPerPartition = fpp,
      sortWithin = sortWithin, vacuum = vacuum,
      rangeFiles = fpp > 1 && sortWithin.nonEmpty)
  }

  /** The clustered plan for one generation of a VERSIONED clustered
    * fact, geometry-validated: range cluster for one key, Morton
    * z-order for several (see [[LayoutOps.clusterWrite]] /
    * [[LayoutOps.zorderWrite]] for the layout rationale).
    */
  private def clusteredFrame(df: DataFrame, cols: Seq[String],
      partitions: Int, zorder: Boolean, bits: Int): DataFrame = {
    require(cols.nonEmpty && partitions >= 1,
      s"clustered artifact: need cluster columns and partitions >= 1 " +
        s"(got $cols, $partitions)")
    if (zorder) {
      require(cols.size >= 2,
        s"clustered artifact: z-order needs >= 2 columns (got $cols)")
      require(bits >= 1 && bits <= 16,
        s"clustered artifact: bits must be in [1, 16] (got $bits)")
      require(cols.size * bits <= 63,
        s"clustered artifact: ${cols.size} cols x $bits bits must " +
          "fit a long")
      LayoutOps.zorderFrame(df, cols, partitions, bits)
    } else LayoutOps.clusterFrame(df, cols, partitions)
  }

  /** READ-BACK frame shape of a written generation: the named
    * partition columns (directory-encoded on disk, whether or not
    * they were columns of the written frame) move to the END in
    * directory order and take the IntegerType partition inference
    * assigns integral values — so a build/append pin (from the
    * written schema) and a compaction pin (from the live read-back
    * schema) describe the same artifact IDENTICALLY, and the stored
    * schema never flip-flops across mutation flavors. Readers of the
    * committed-empty frame cast partition columns explicitly exactly
    * as they do after a live read.
    */
  private[operators] def frameShapeJson(
      schema: org.apache.spark.sql.types.StructType,
      partCols: Seq[String]): String = {
    import org.apache.spark.sql.types.{IntegerType, StructField,
      StructType}
    val data = schema.fields.filterNot(f => partCols.contains(f.name))
    StructType(data ++ partCols.map(c =>
      StructField(c, IntegerType, nullable = true))).json
  }

  /** Build a VERSIONED clustered fact artifact: one fresh generation
    * holds the clustered (range or z-order) tree, and the manifest
    * pins it —
    * the manifest-governed successor of a flat
    * [[LayoutOps.clusterWrite]] directory. Readers go through
    * [[frame]], so [[compactClusteredGenerations]] can re-cluster
    * WITHOUT the [[LayoutOps.swapInto]] rename window a flat
    * directory's in-place compaction needs: a reader loaded
    * pre-compaction keeps serving its pinned generation through the
    * flip. Row-group skipping is unchanged — the clustered files sit
    * inside the generation directory and pushed predicates prune
    * their row groups exactly as in the flat layout.
    */
  def clusterBuild(df: DataFrame, dir: String, cols: Seq[String],
      partitions: Int, zorder: Boolean = false, bits: Int = 8,
      extraWriteOpts: Map[String, String] = Map.empty): Unit = {
    val s = df.sparkSession
    // a build STARTS the artifact: the new tree is written to a
    // FRESH generation number FIRST, and only then is every previous
    // generation (appended AND orphaned) wiped — recordBuild adopts
    // the LISTING, so skipping the wipe would resurrect the old
    // generations next to the new data. Write-before-delete matters
    // because `df` is LAZY: an input derived from the artifact
    // itself (e.g. `frame(s, dir)` for a full re-cluster) is only
    // executed by the write — deleting first would wipe its source
    // files and silently build an empty artifact. The manifest chain
    // is kept so versions stay monotone across rebuilds. Destructive
    // by design once the wipe starts — same single-writer
    // maintenance-window contract as every artifact mutation (a live
    // reader pinned to the old generations loses its files;
    // rebuild-under-readers needs [[compactClusteredGenerations]]'s
    // manifest flip, or a new root + pointer flip one level up). A
    // kill after the write but before the wipe leaves the new
    // generation an uncommitted orphan (manifest unchanged, readers
    // unaffected); the re-run wipes it with the rest and rebuilds.
    val fs = fsOf(s, new Path(dir))
    val previous = LayoutOps.ingestGenerations(s, dir)
    val newGen = previous.maxOption.map(_ + 1L).getOrElse(0L)
    val laid = clusteredFrame(df, cols, partitions, zorder, bits)
    laid.write.options(extraWriteOpts).mode("overwrite")
      .parquet(s"$dir/ingest=$newGen")
    for (g <- previous)
      require(fs.delete(new Path(dir, s"ingest=$g"), true),
        s"clusterBuild: could not remove previous generation $g of " +
          dir)
    recordBuild(s, dir,
      Some(frameShapeJson(laid.schema, Seq("ingest"))))
  }

  /** Append one clustered generation to a [[clusterBuild]] artifact
    * (each batch clusters ITS OWN rows; cross-generation overlap is
    * what [[compactClusteredGenerations]] periodically repairs).
    * Returns the committed generation.
    */
  def clusterAppend(df: DataFrame, dir: String, cols: Seq[String],
      partitions: Int, zorder: Boolean = false, bits: Int = 8,
      extraWriteOpts: Map[String, String] = Map.empty): Long = {
    val s = df.sparkSession
    val listed = LayoutOps.ingestGenerations(s, dir)
    require(listed.nonEmpty,
      s"clusterAppend: $dir has no ingest= partitions — build the " +
        "artifact with clusterBuild first")
    val gen = listed.max + 1
    val laid = clusteredFrame(df, cols, partitions, zorder, bits)
    laid.write.options(extraWriteOpts).mode("overwrite")
      .parquet(s"$dir/ingest=$gen")
    recordAppend(s, dir, gen,
      Some(frameShapeJson(laid.schema, Seq("ingest"))))
    gen
  }

  /** Re-cluster the LIVE generations of a [[clusterBuild]] artifact
    * into one new generation and flip the manifest — the reader-safe
    * successor of [[LayoutOps.compactClusteredInPlace]], which
    * rewrites through a [[LayoutOps.swapInto]] rename window a
    * concurrent reader can straddle. Appends degrade a clustered
    * fact in BOTH dimensions (each generation adds files, and each
    * clusters only its own rows, so cross-generation key ranges
    * overlap and row-group skipping decays); this pass re-derives the
    * cluster/z plan from the CURRENT live contents — one quantile
    * pass (z only) + one range shuffle, the same cost as the original
    * clustered write. Steps are [[compactGenerations]]'s: pinned live
    * set in, brand-new `ingest=` directory out, manifest flip,
    * deferred-able [[vacuum]]. Returns the surviving generation.
    */
  def compactClusteredGenerations(s: SparkSession, dir: String,
      cols: Seq[String], partitions: Int, zorder: Boolean = false,
      bits: Int = 8, extraWriteOpts: Map[String, String] = Map.empty,
      vacuum: Boolean = true): Long = {
    val listed = LayoutOps.ingestGenerations(s, dir)
    require(listed.nonEmpty,
      s"compactClusteredGenerations: $dir has no ingest= partitions " +
        "— not a built artifact")
    requireNotCommittedEmpty(s, dir, "compactClusteredGenerations")
    val newGen = listed.max + 1
    val live = frame(s, dir)
    clusteredFrame(live.drop("ingest"), cols, partitions,
        zorder, bits)
      .write.options(extraWriteOpts).mode("overwrite")
      .parquet(s"$dir/ingest=$newGen")
    val raw = rawListings(s, dir, Seq(newGen))
    commit(s, dir, Seq(newGen), fullSignatureOf(raw, Seq(newGen)),
      latest(s, dir), digestsOf(raw), Some(live.schema.json))
    if (vacuum) this.vacuum(s, dir)
    newGen
  }

  /** A compaction of a COMMITTED-EMPTY artifact (a total takedown
    * emptied every live generation, while a crashed append's orphan
    * keeps the directory listing nonempty) would write a zero-row
    * generation with no parquet files and pin it — making every
    * subsequent [[frame]] read fail on schema inference. There is
    * nothing to compact; orphan reaping is [[vacuum]]'s job.
    */
  private def requireNotCommittedEmpty(s: SparkSession, dir: String,
      op: String): Unit =
    latest(s, dir).foreach(p => require(p.generations.nonEmpty,
      s"$op: $dir is committed-empty (live generation set is empty) " +
        "— nothing to compact; run vacuum to reap orphans"))

  /** Reap every generation directory the latest manifest does not
    * list — superseded pre-compaction generations and crashed appends'
    * uncommitted orphans. Requires a manifest (without one, the
    * listing IS the live set and there is nothing safe to reap).
    */
  def vacuum(s: SparkSession, dir: String): Unit =
    latest(s, dir).foreach { p =>
      val live = p.generations.toSet
      val fs = fsOf(s, new Path(dir))
      for (g <- LayoutOps.ingestGenerations(s, dir) if !live(g)) {
        val gp = new Path(dir, s"ingest=$g")
        require(fs.delete(gp, true),
          s"vacuum: failed to remove superseded generation $gp")
      }
    }
}
