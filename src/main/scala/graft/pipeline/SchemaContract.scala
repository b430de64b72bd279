package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingest schema-contract enforcement (r13) — the WRITE-time complement
  * of s12/s13's read-time schema evolution: before an arriving vintage
  * is admitted to a landing zone, its (footer) schema is diffed against
  * the table's contract and each column gets a verdict:
  *
  *  - `ok`            in both, same type, nullability compatible —
  *                    always allowed;
  *  - `nullability_relaxed` in both, same type, but the contract
  *                    promises NON-NULL and the arriving vintage is
  *                    nullable — refused (ADVICE r13: readers relying on
  *                    the contract's non-null promise would start seeing
  *                    NULLs); tightening (nullable contract, non-null
  *                    arrival) is fine and stays `ok`;
  *  - `added`         only in the arriving vintage — allowed iff
  *                    nullable (old files read NULL through mergeSchema
  *                    / the evolved catalog, exactly s12/s13's law; a
  *                    non-nullable addition would promise readers a
  *                    value old files cannot give);
  *  - `removed`       only in the contract — never allowed (readers
  *                    selecting it break);
  *  - `type_changed`  in both, different type — never allowed (parquet
  *                    footer reconciliation would fail or silently
  *                    widen).
  *
  * Pure driver-side metadata (parquet footers only — no data job, the
  * PlanLint discipline); `enforce` throws with the violation list, the
  * gate a `foreachBatch` ingest calls before admitting a batch.
  */
object SchemaContract {

  final case class Check(column: String, dtype: String, status: String,
                         allowed: Boolean)

  def diff(contract: StructType, arriving: StructType): Seq[Check] = {
    val c = contract.fields.map(f => f.name -> f).toMap
    val a = arriving.fields.map(f => f.name -> f).toMap
    val names = (contract.fields.map(_.name) ++
      arriving.fields.filterNot(f => c.contains(f.name)).map(_.name)).toSeq
    names.map { n =>
      (c.get(n), a.get(n)) match {
        case (Some(cf), Some(af)) if cf.dataType == af.dataType =>
          if (!cf.nullable && af.nullable)
            Check(n, cf.dataType.simpleString, "nullability_relaxed",
              allowed = false)
          else Check(n, cf.dataType.simpleString, "ok", allowed = true)
        case (Some(cf), Some(af)) =>
          Check(n, s"${cf.dataType.simpleString}->${af.dataType.simpleString}",
            "type_changed", allowed = false)
        case (Some(cf), None) =>
          Check(n, cf.dataType.simpleString, "removed", allowed = false)
        case (None, Some(af)) =>
          Check(n, af.dataType.simpleString, "added", allowed = af.nullable)
        case (None, None) => sys.error("unreachable")
      }
    }
  }

  /** Verdicts as a DataFrame (columns `column, dtype, status, allowed`). */
  def report(contract: StructType, arriving: StructType)
            (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    diff(contract, arriving).toDF()
  }

  /** Throw (listing every violation) unless the arriving schema is
    * admissible under the contract. */
  def enforce(contract: StructType, arriving: StructType): Seq[Check] = {
    val checks = diff(contract, arriving)
    val bad = checks.filterNot(_.allowed)
    if (bad.nonEmpty) throw new org.apache.spark.SparkException(
      "Schema contract violated:\n" + bad.map(b =>
        s"  ${b.status} ${b.column} (${b.dtype})").mkString("\n"))
    checks
  }
}
