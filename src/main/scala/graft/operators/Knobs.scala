package graft.operators

import org.apache.spark.sql.SparkSession

/** Central, VALIDATED parsing of the engine's `graft.*` session
  * knobs.
  *
  * Every knob is an operational override, and a bad value's failure
  * mode is SILENT: a typo'd number used to throw a bare
  * NumberFormatException from deep inside a gate with no hint of
  * which conf key it came from, and a pathological value threw
  * nothing at all — it quietly degraded the behavior the knob exists
  * to protect (a zero-millisecond steal horizon makes every live
  * writer's lease instantly stealable; a negative recall bar makes
  * the ADC report never refuse; a negative payoff factor force-
  * engages the native tier on stores it cannot pay on). This is the
  * ADC-report enforcement lesson generalized to the whole knob
  * surface: an opt-in flag refuses loudly on values outside its
  * contract instead of honoring them.
  *
  * Documented sentinels (0 = force / 0 = disable) are part of each
  * knob's declared legal range and keep working; anything outside
  * refuses naming the key, the offending value, and the range.
  */
private[graft] object Knobs {

  /** The knob-refusal type: a subclass of IllegalArgumentException
    * (so `intercept[IllegalArgumentException]` and generic contract
    * handlers keep working) that best-effort fallbacks can
    * DISTINGUISH from other IllegalArgumentExceptions. The lease
    * protocol's transient two-stealer read-back race also surfaces
    * as an IllegalArgumentException ("re-run this batch"); a serving
    * path that must rethrow misconfiguration but absorb ordinary
    * contention matches on this type, not on the shared parent.
    */
  final class Refused(msg: String)
    extends IllegalArgumentException(msg)

  /** Long-valued knob with an inclusive legal range. */
  def long(s: SparkSession, key: String, default: Long,
      min: Long = Long.MinValue, max: Long = Long.MaxValue): Long =
    s.conf.getOption(key).fold(default) { raw =>
      val v = try raw.trim.toLong
        catch { case _: NumberFormatException =>
          throw new Refused(
            s"$key must be an integer (got '$raw')")
        }
      if (v < min || v > max) throw new Refused(
        s"$key must be in [$min, $max] (got $v)")
      v
    }

  /** Double-valued knob with an inclusive legal range. */
  def double(s: SparkSession, key: String, default: Double,
      min: Double, max: Double): Double =
    s.conf.getOption(key).fold(default) { raw =>
      val v = try raw.trim.toDouble
        catch { case _: NumberFormatException =>
          throw new Refused(
            s"$key must be a number (got '$raw')")
        }
      if (v < min || v > max || v.isNaN)
        throw new Refused(
          s"$key must be in [$min, $max] (got $v)")
      v
    }

  /** Strict boolean knob: `true`/`false` only. The previous
    * contains("true") parsing read a typo'd `TRUE` (or `yes`, or
    * `1`) as FALSE — silently dropping the override the operator
    * believed they set.
    */
  def flag(s: SparkSession, key: String,
      default: Boolean = false): Boolean =
    s.conf.getOption(key).fold(default) { raw =>
      raw.trim match {
        case "true" => true
        case "false" => false
        case other => throw new Refused(
          s"$key must be 'true' or 'false' (got '$other')")
      }
    }
}
