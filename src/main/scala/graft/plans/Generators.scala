package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram table function — the UDTF leg of the reference's
  * "register your own function" contract
  * (/root/reference/src/mr/function.rs:1): where `wc::map` turns one blob
  * into N rows through the hard-coded dispatch at
  * /root/reference/src/mr/worker.rs:37-39, this is a first-class Catalyst
  * `Generator`, so `SELECT ... FROM docs LATERAL VIEW char_ngrams(text, 5)`
  * plans a native `Generate` node — no UDF wrapper, no re-parse per row.
  *
  * Semantics: all contiguous n-grams by Unicode code point (UTF8String
  * character positions ≡ DuckDB `substr` counting, NOT Java UTF-16 units —
  * the engines agree on é and 汉 without caveats). A string shorter than n
  * yields no rows; NULL yields no rows.
  *
  * Per-row cost is O(bytes): one pass records each character's byte
  * offset, then every gram is a zero-copy byte-range view over the same
  * array. The naive UTF8String.substring(i, i+n) alternative re-scans
  * from byte 0 per gram — O(bytes²) on multi-byte text.
  */
case class CharNGrams(child: Expression, nExpr: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), nExpr = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"char_ngrams expects a string column, got ${child.dataType.sql}")
    else if (nExpr.dataType != IntegerType || !nExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "char_ngrams expects a literal int n")
    else TypeCheckResult.TypeCheckSuccess

  override def elementSchema: StructType =
    new StructType().add("gram", StringType, nullable = false)

  private lazy val n: Int = {
    val v = nExpr.eval(null).asInstanceOf[Int]
    require(v > 0, s"char_ngrams n must be positive, got $v")
    v
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Iterator.empty
    val bytes = raw.asInstanceOf[UTF8String].getBytes
    // charOff(i) = byte offset of the i-th code point; charOff(numChars) = len
    val offBuf = new Array[Int](bytes.length + 1)
    var chars = 0
    var b = 0
    while (b < bytes.length) {
      offBuf(chars) = b
      // UTF-8 leading byte → sequence length (continuation bytes skipped)
      val lead = bytes(b) & 0xFF
      b += (if (lead < 0x80) 1 else if (lead < 0xE0) 2 else if (lead < 0xF0) 3 else 4)
      chars += 1
    }
    offBuf(chars) = bytes.length
    val total = chars - n + 1
    if (total <= 0) return Iterator.empty
    val off = offBuf
    Iterator.tabulate(total) { i =>
      val gram = UTF8String.fromBytes(bytes, off(i), off(i + n) - off(i))
      new GenericInternalRow(Array[Any](gram))
    }
  }
}
