package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF: element-wise minimum over minhash signatures.
  *
  * Folding per-document signatures with element-wise min yields the exact
  * minhash signature of the UNION of the documents' shingle sets — so a
  * groupBy with this aggregator produces a per-group (e.g. per-source,
  * per-domain) similarity sketch in one pass, mergeable across partitions
  * (min is associative/commutative ⇒ map-side partial aggregation works).
  *
  * This is the engine's `Aggregator[IN, BUF, OUT]` extension-surface demo
  * (SURVEY.md §2 "UDF/UDAF surface"): the reference's only extension point
  * is the user callback (/root/reference/src/graph_loader.rs:379-383).
  */
object MinHashAgg extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] =
    merge(buf, sig)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length, "signature width mismatch")
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { out(i) = math.min(a(i), b(i)); i += 1 }
    out
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  private val longArrayEnc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc

  override def outputEncoder: Encoder[Array[Long]] = longArrayEnc

  /** Column form for untyped groupBy.agg. */
  def column(sigCol: Column): Column =
    org.apache.spark.sql.functions.udaf(this).apply(sigCol)

  /** Estimate Jaccard similarity of two sketches: fraction of agreeing
    * signature slots.
    */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty || b.isEmpty || a.length != b.length) return 0.0
    var agree = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) agree += 1; i += 1 }
    agree.toDouble / a.length
  }
}
