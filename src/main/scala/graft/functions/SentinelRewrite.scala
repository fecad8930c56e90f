package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, EqualTo, Expression, IsNull}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.MetadataBuilder

/** Sentinel→NULL predicate rewrite (SURVEY.md §4.2 polish).
  *
  * The reference's data model mixes SQL NULL with per-variable sentinel
  * floats (`NoDataValue`, reference: odmdata/variable.py:23) and its
  * queries compare against the sentinel directly (e.g. no-data
  * exclusion, series_service.py:642-647). This engine keeps NULL
  * internally and applies sentinels only at sinks — so legacy
  * sentinel-equality predicates would silently match nothing.
  *
  * Columns TAGGED with `graft.sentinel` metadata (the tag asserts the
  * column was normalized on load: sentinel values replaced by NULL, see
  * [[Sentinels.toNull]]) get `col = <sentinel>` rewritten to
  * `col IS NULL` by this optimizer rule. Besides restoring the legacy
  * semantics, IS NULL is pushable: after the rewrite the predicate
  * reaches the parquet scan as a null-count filter, where a
  * double-equality against a magic number never could match the file
  * statistics.
  *
  * `col != <sentinel>` needs no separate case: it parses as
  * Not(EqualTo(..)), the inner EqualTo rewrites here, and the stock
  * optimizer folds Not(IsNull) to IsNotNull.
  *
  * Runs as an analyzer resolution rule (see GraftExtensions): the
  * pattern only matches resolved attribute/literal pairs, so partially
  * unresolved plans pass through untouched, and the rewrite is
  * guaranteed to precede every optimizer batch (including the eager
  * LocalRelation evaluation).
  */
object SentinelRewrite extends Rule[LogicalPlan] {
  val Key = "graft.sentinel"

  private def sentinelOf(a: AttributeReference): Option[Double] =
    if (a.metadata.contains(Key)) Some(a.metadata.getDouble(Key)) else None

  /** The tagged attribute, possibly behind an implicit numeric Cast
    * (a FloatType tagged column compared to a double literal resolves
    * as Cast(attr, double) = lit).
    */
  private def attrOf(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    // only LOSSLESS (widening) casts may be unwrapped: the intended
    // match is the implicit float→double coercion. A narrowing cast
    // like CAST(col AS INT) = sentinel matches a whole RANGE of values
    // under truncation (col ∈ (-10000,-9998) for -9999), and rewriting
    // it to IS NULL would silently change which rows match.
    case c: Cast if Cast.canUpCast(c.child.dataType, c.dataType) =>
      c.child match {
        case a: AttributeReference => Some(a)
        case _ => None
      }
    case _ => None
  }

  /** Constant side: any resolved foldable expression — covers bare
    * literals AND Cast-wrapped ones (`col === -9999` with an Int
    * literal resolves as Cast(-9999, double), which constant-folding
    * would only collapse AFTER analysis, i.e. after this rule runs).
    */
  private def constOf(e: Expression): Option[Any] =
    if (e.resolved && e.foldable) Option(e.eval(null)) else None

  private def matches(a: Expression, lit: Expression): Boolean =
    attrOf(a).flatMap(sentinelOf).exists { s =>
      constOf(lit).exists {
        case d: java.lang.Double  => d.doubleValue() == s
        case f: java.lang.Float   => f.doubleValue() == s
        case i: java.lang.Integer => i.doubleValue() == s
        case l: java.lang.Long    => l.doubleValue() == s
        case _ => false
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case EqualTo(l, r) if matches(l, r) => IsNull(attrOf(l).get)
      case EqualTo(l, r) if matches(r, l) => IsNull(attrOf(r).get)
    }
}

/** Load-side sentinel normalization + tagging helpers. */
object Sentinels {
  /** Replace a column's sentinel value with NULL and tag the column so
    * [[SentinelRewrite]] recognizes legacy sentinel predicates against
    * it. The engine-internal representation is always NULL (SURVEY.md
    * §7.5 risk 2); sinks re-apply sentinels via PivotOps.fillSentinels.
    */
  def toNull(df: DataFrame, colName: String, sentinel: Double): DataFrame = {
    // STRIP any existing tag first, as its OWN projection: the rewrite
    // rule runs during this frame's analysis, and on an already-tagged
    // input (a re-read of a tagged pipeline's parquet output — Spark
    // persists StructField metadata — or toNull applied twice) it
    // would rewrite the normalization predicate below into IS NULL: a
    // silent no-op that still asserts "normalized" via the tag, so
    // raw sentinel rows would pass every downstream filter. An inline
    // alias inside the predicate would not do: CleanupAliases strips
    // it and the tagged attribute resurfaces; a separate projection
    // makes the predicate resolve against a genuinely untagged
    // attribute.
    val untagged = df.withColumn(colName, col(colName)
      .as(colName, org.apache.spark.sql.types.Metadata.empty))
    val cleaned = org.apache.spark.sql.functions
      .when(col(colName) === sentinel, null).otherwise(col(colName))
    untagged.withColumn(colName, tagged(cleaned, colName, sentinel))
  }

  /** Tag only (for columns already normalized upstream). */
  def tag(df: DataFrame, colName: String, sentinel: Double): DataFrame =
    df.withColumn(colName, tagged(col(colName), colName, sentinel))

  private def tagged(c: Column, name: String, sentinel: Double): Column =
    c.as(name, new MetadataBuilder()
      .putDouble(SentinelRewrite.Key, sentinel).build())
}
