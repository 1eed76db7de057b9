package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns (reference README.md:52
  * "root cause embeddings"; harness embeddings.parquet, dim 64).
  *
  * Composed from codegen'd higher-order functions — `zip_with` +
  * `aggregate` fold left-to-right, which keeps results bit-identical to a
  * sequential engine (the DuckDB oracle) AND deterministic under Spark
  * parallelism. A custom Catalyst Expression with doGenCode is the
  * planned fast path if benchmarks demand (SURVEY.md §4 candidate 1).
  */
object VectorFunctions {

  /** Cast float embeddings to double once, up front — float→double is
    * exact, and all downstream arithmetic stays in double. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))
}
