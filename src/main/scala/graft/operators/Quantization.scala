package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar embedding quantization (int8) — the memory-side half of
  * similarity search at 100 TB: a 64-dim float32 embedding is 256 B,
  * its int8 code 64 B, so the same executors hold 4× the index (the
  * standard SQ8 technique from the ANN literature — Faiss's
  * ScalarQuantizer, public knowledge).
  *
  * Codes are SYMMETRIC per-corpus linear quantization: one global
  * [lo, hi] range (computed once, broadcast) maps each component to a
  * level in [0, 255]; reconstruction is the level midpoint. Everything
  * is deterministic exact-portable arithmetic — one subtraction,
  * division, floor, clamp per component via codegen'd array HOFs — so
  * codes AND reconstructions hash-oracle across engines, and the
  * recall cost of searching quantized vectors is measurable in-band
  * (the q_sim_quantized query emits it as a certified boolean).
  *
  * Shape: the range probe is one tiny global aggregate (broadcast
  * back); encode/decode are pure projections — no shuffle anywhere.
  */
object Quantization {

  /** Per-corpus [lo, hi] component range as a 1-row frame (_qlo, _qhi). */
  def componentRange(df: DataFrame, vec: Column): DataFrame =
    df.select(explode(vec).as("_x"))
      .agg(min(col("_x")).cast("double").as("_qlo"),
        max(col("_x")).cast("double").as("_qhi"))

  /** Quantize to levels 0..levels-1: code_i = clamp(floor((x_i - lo) / step)).
    * `lo`/`hi` are columns so the broadcast 1-row range attaches without
    * a collect. */
  def encode(vec: Column, lo: Column, hi: Column, levels: Int = 256): Column = {
    val step = (hi - lo) / lit(levels.toDouble)
    transform(vec, x =>
      least(lit(levels - 1), greatest(lit(0),
        floor((x - lo) / step).cast("int"))))
  }

  /** Reconstruct level midpoints: x̂_i = lo + (code_i + 0.5) · step. */
  def decode(codes: Column, lo: Column, hi: Column, levels: Int = 256): Column = {
    val step = (hi - lo) / lit(levels.toDouble)
    transform(codes, c => lo + (c.cast("double") + lit(0.5)) * step)
  }

  /** Attach int8-style codes and midpoint reconstructions to an
    * embedding frame: adds `codes` (array<int> in [0, levels)) and
    * `recon` (array<double>). */
  def withQuantized(
      df: DataFrame, vec: Column, levels: Int = 256): DataFrame = {
    val range = componentRange(df, vec)
    df.crossJoin(broadcast(range))
      .withColumn("codes", encode(vec, col("_qlo"), col("_qhi"), levels))
      .withColumn("recon", decode(col("codes"), col("_qlo"), col("_qhi"), levels))
      .drop("_qlo", "_qhi")
  }
}
