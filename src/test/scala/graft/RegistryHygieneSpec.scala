package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType, TimestampType, TimestampNTZType}
import org.scalatest.funsuite.AnyFunSuite

/** Mechanical gates over the WHOLE query registry — the failure classes
  * that slip past per-query specs because they live in the driver's
  * compare harness, not in query semantics:
  *
  *  - a raw array/map/struct OUTPUT column breaks the driver's pandas
  *    canonical sort (`unhashable type: numpy.ndarray`) even when both
  *    engines agree on values — the round-9 q_sim_quantized lesson.
  *    House convention: serialize (array_join / md5) or reduce to
  *    scalars before the final select;
  *  - a raw timestamp output hashes differently across engines'
  *    microsecond/nanosecond conventions (epoch_ms / DATE instead) —
  *    QuerySpec's documented conventions, now asserted.
  *
  * Name uniqueness and oracle-key coverage live in RelationalSpec;
  * column-NAME parity with the DuckDB oracle is checked per-run by
  * tools/oracle_check.py (it needs DuckDB, which tests don't have).
  *
  * Cost note: building a plan only ANALYZES it (no jobs) for all pure
  * queries; the handful of iterative-ML builders do eager small work at
  * sf0.001 — the whole sweep stays in test-suite budget. */
class RegistryHygieneSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  private lazy val schemas =
    SparkEntry.specs.map { q => q.name -> q.build(spark, sfDir).schema }

  test("no registry query emits a raw array/map/struct output column") {
    val offenders = schemas.flatMap { case (name, schema) =>
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"serialize these for the oracle hash (array_join/md5/scalars): ${offenders.mkString(", ")}")
  }

  test("no registry query emits a raw timestamp output column") {
    val offenders = schemas.flatMap { case (name, schema) =>
      schema.fields.collect {
        case f if f.dataType == TimestampType || f.dataType == TimestampNTZType =>
          s"$name.${f.name}"
      }
    }
    assert(offenders.isEmpty,
      s"emit epoch_ms/DATE instead of raw timestamps: ${offenders.mkString(", ")}")
  }

  test("every oracle references only tables that exist in the test data") {
    val tables = Set("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
    // word-level scan: an oracle naming a table outside the driver's view
    // set fails at replay with a confusing DuckDB binder error
    val known = tables ++ Set.empty
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // EXTRACT(hour FROM ts) / SUBSTRING(x FROM 1) / TRIM(c FROM s) use
      // FROM as a function keyword, not a table reference — drop the spans
      val scannable = "(?i)IS\\s+(?:NOT\\s+)?DISTINCT\\s+FROM".r.replaceAllIn(
        "(?i)(?:EXTRACT|SUBSTRING|TRIM)\\s*\\([^()]*\\)".r.replaceAllIn(sql, " "),
        " = ") // comparison operator, not a table reference
      val fromTargets = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
        .findAllMatchIn(scannable).map(_.group(1).toLowerCase).toSet
      // CTE names, with or without a column list or a materialization
      // hint: `x AS (`, `walk(a, b) AS (`, `r1 AS MATERIALIZED (`
      val ctes =
        "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*(?:MATERIALIZED\\s*|NOT\\s+MATERIALIZED\\s*)?\\(".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = fromTargets -- known -- ctes --
        Set("unnest", "read_parquet", "generate_series", "range", "values",
          "lateral") // JOIN LATERAL (...) — keyword, not a table
      assert(unknown.isEmpty, s"$name references unknown tables: ${unknown.mkString(", ")}")
    }
  }
}
