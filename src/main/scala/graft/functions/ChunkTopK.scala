package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Block-at-a-time ANN scoring: the per-(probe, chunk) top-k of
  * `cos(query, v)` over a PACKED chunk of an inverted list, computed inside
  * one expression evaluation.
  *
  * Row-at-a-time candidate generation (probe ⋈ list → one row per candidate
  * pair) materializes |corpus|·nProbe·|list| joined rows each carrying two
  * full embedding arrays — measured, the row copying dominated the kNN-graph
  * runtime at 10× scale, not the arithmetic. Packing each list into bounded
  * chunks (one row per chunk) turns the join output into
  * |probes|·chunksPerList rows, and this expression runs the dot-product
  * loop over the chunk in place — the 100 TB-safe shape, since chunk rows
  * are bounded (≤ chunkSize vectors) no matter how skewed a list gets.
  *
  * The chunk's vectors arrive FLATTENED (`vecsFlat` = concatenation of the
  * chunk's vectors, `lens` = each vector's length): the earlier
  * array-of-arrays layout paid one ArrayData wrapper allocation plus a
  * numElements call PER CANDIDATE in the hot loop (100M candidates at 10×
  * bench scale), where the flat layout reads one UnsafeArrayData
  * monomorphically end to end. The per-vector lengths keep ragged input
  * exact: a vector whose length differs from the query's is skipped and the
  * cursor advances by ITS length, so later candidates stay aligned.
  *
  * Scoring is bit-identical to [[CosineSimilarity]]: `dot / (√Σq² · √Σv²)`
  * with sequential accumulation (the chunk norms are packed precomputed as
  * `sqrt(dot(v,v))`). Per-candidate semantics match the row-at-a-time
  * pipeline exactly: null-normed or length-mismatched vectors are skipped
  * (their dot/norm would have been null), a null component skips its
  * candidate, NaN sims are skipped (the isnan filter), self matches are
  * skipped when `excludeSelf`, and ties order by (sim desc, vid asc).
  * Evaluation cost is one |chunk|·dim loop per call, so CodegenFallback
  * overhead is amortized to nothing. */
case class ChunkTopK(qid: Expression, qv: Expression, ids: Expression,
                     norms: Expression, vecsFlat: Expression, lens: Expression,
                     k: Int, excludeSelf: Boolean)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(qid, qv, ids, norms, vecsFlat, lens)

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, ArrayType(DoubleType), ArrayType(LongType),
      ArrayType(DoubleType), ArrayType(DoubleType), ArrayType(IntegerType))
    val ok = children.map(_.dataType).zip(expected).forall {
      case (a: ArrayType, b: ArrayType) => DataType.equalsIgnoreNullability(a, b)
      case (a, b) => a == b
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (long, array<double>, array<long>, array<double>, " +
        s"array<double>, array<int>), got ${children.map(_.dataType.simpleString)}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vid", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def foldable: Boolean = false

  override def prettyName: String = "chunk_top_k"

  override def eval(input: InternalRow): Any = {
    val qvA = qv.eval(input)
    val idsA = ids.eval(input)
    val normsA = norms.eval(input)
    val vecsA = vecsFlat.eval(input)
    val lensA = lens.eval(input)
    if (qvA == null || idsA == null || normsA == null || vecsA == null ||
        lensA == null)
      return new GenericArrayData(Array.empty[Any])
    val q = qvA.asInstanceOf[ArrayData]
    val vidArr = idsA.asInstanceOf[ArrayData]
    val normArr = normsA.asInstanceOf[ArrayData]
    val flat = vecsA.asInstanceOf[ArrayData]
    val lenArr = lensA.asInstanceOf[ArrayData]
    val qidV: Long = if (excludeSelf) {
      val e = qid.eval(input)
      if (e == null) Long.MinValue else e.asInstanceOf[Long]
    } else Long.MinValue
    val d = q.numElements()
    // query norm, same sequential accumulation as CosineSimilarity; the
    // query components hoist into a primitive array once per eval so the
    // |chunk|·dim hot loop reads one side without ArrayData calls
    val qArr = new Array[Double](d)
    var qs = 0.0
    var i = 0
    while (i < d) {
      if (q.isNullAt(i)) return new GenericArrayData(Array.empty[Any])
      val x = q.getDouble(i); qArr(i) = x; qs += x * x; i += 1
    }
    val qn = math.sqrt(qs)
    // bounded top-k kept sorted by (sim desc, vid asc); k is small
    val topIds = new Array[Long](k)
    val topSims = new Array[Double](k)
    var n = 0
    val m = vidArr.numElements()
    var c = 0
    var off = 0
    while (c < m) {
      // a null length means the packer's stride bookkeeping is broken —
      // alignment of every later candidate is lost, so bail on the chunk
      if (lenArr.isNullAt(c)) return new GenericArrayData(Array.empty[Any])
      val lenC = lenArr.getInt(c)
      if (lenC < 0 || off + lenC > flat.numElements())
        return new GenericArrayData(Array.empty[Any]) // stride corruption guard
      var skip = normArr.isNullAt(c) || lenC != d
      val vid = if (vidArr.isNullAt(c)) { skip = true; 0L } else vidArr.getLong(c)
      if (!skip && excludeSelf && vid == qidV) skip = true
      if (!skip) {
        var dotv = 0.0
        var j = 0
        while (j < d && !skip) {
          if (flat.isNullAt(off + j)) skip = true
          else { dotv += qArr(j) * flat.getDouble(off + j); j += 1 }
        }
        if (!skip) {
          val sim = dotv / (qn * normArr.getDouble(c))
          if (!sim.isNaN) {
            // insert if better than the current worst (or not full)
            if (n < k || sim > topSims(n - 1) ||
                (sim == topSims(n - 1) && vid < topIds(n - 1))) {
              var pos = if (n < k) n else n - 1
              while (pos > 0 && (topSims(pos - 1) < sim ||
                  (topSims(pos - 1) == sim && topIds(pos - 1) > vid))) {
                topSims(pos) = topSims(pos - 1); topIds(pos) = topIds(pos - 1)
                pos -= 1
              }
              topSims(pos) = sim; topIds(pos) = vid
              if (n < k) n += 1
            }
          }
        }
      }
      off += lenC
      c += 1
    }
    val out = new Array[Any](n)
    var r = 0
    while (r < n) { out(r) = InternalRow(topIds(r), topSims(r)); r += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkTopK =
    copy(qid = newChildren(0), qv = newChildren(1), ids = newChildren(2),
      norms = newChildren(3), vecsFlat = newChildren(4), lens = newChildren(5))
}
