package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row pHash band-code computation: payload text → `bands`
  * packed band codes, ONE pass over the UTF-8 bytes, zero shuffle.
  *
  * Replaces the explode-and-shuffle pixel stage
  * (`posexplode(split(text, "")) → groupBy(doc, seg)`), whose shuffle
  * volume is Θ(total chars) — the measured x1000 bound of the pHash
  * probe family (SCALE.md r11 residual #2: ENOSPC in the
  * posexplode→(doc,seg) exchange after 759–1008 s at either dial). A
  * perceptual code is a PER-DOCUMENT function of the payload alone, so
  * nothing about it needs a shuffle: this expression computes the
  * segment sums, their total, the mean threshold, and the packed band
  * codes in a single scan-side pass, cutting the pixel stage's shuffle
  * volume Θ(chars) → 0. On a 1000-executor cluster the codes
  * materialize in the parquet scan stage itself; the first exchange of
  * the near-dup dataflow is the banded candidate join, which was always
  * the plan's real work.
  *
  * Semantics are pinned to the prior dataflow and the DuckDB oracle
  * (see `Multimodal.phashQuery`): `n = numChars(text)`; the character
  * at 0-based position `pos` belongs to segment
  * `(segs·pos + segs − 1) div n` (identical to the oracle's 1-based
  * range slicing for every n — the prior form's verified invariant);
  * pixel = Σ code points in the segment; bit `j` of band `b` is set iff
  * `p[b·bandBits + j] > tot / segs` compared in DOUBLE precision —
  * exactly the `px > tot / segs.0` comparison both engine texts use, an
  * ulp-sensitive boundary that must not be "simplified" to the integer
  * form `px·segs > tot` (the two disagree when `tot/segs` rounds down
  * past an exact-tie pixel). Empty text (n = 0) → all-zero codes, the
  * same row the prior left-join reinstated.
  *
  * Like [[HyperplaneBuckets]], the generated code is short
  * runtime-bounded loops over a heap array — constant bytecode size at
  * ANY (segs, bands) dial, so the 256-bit production dial JIT-compiles
  * exactly like the 64-bit fixture dial (the r10 huge-method lesson).
  * UTF-8 decode is done inline on the raw bytes (no per-char String
  * allocation, no regex split): code points are summed, matching
  * Spark's `ascii()` / DuckDB's `ord()` on each character.
  */
case class PhashBandCodes(child: Expression, segs: Int, bands: Int)
    extends UnaryExpression {

  private val bandBits = segs / bands

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects STRING input, got $other")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val out = PhashBandCodes.compute(s, segs, bands, bandBits)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = graft.plans.PhashBandCodes.compute(
         |  $v, $segs, $bands, $bandBits);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PhashBandCodes = copy(child = newChild)
}

object PhashBandCodes {

  /** Shared kernel for the interpreted and generated paths (one body →
    * the two cannot drift; the codegen call is a single static invoke,
    * so generated-method size is constant at any dial and HotSpot
    * JIT-compiles the kernel itself as ordinary bytecode).
    *
    * UTF-8 decode note: `UTF8String` stores valid UTF-8; the decode
    * only needs the leading-byte class to find each code point's width
    * and value. Sums are over code points — `ascii()`'s value for a
    * single-character string, `ord()`'s in DuckDB.
    */
  def compute(s: UTF8String, segs: Int, bands: Int, bandBits: Int)
      : Array[Long] = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    val n = s.numChars()
    val p = new Array[Long](segs)
    var ci = 0L
    var off = 0
    while (off < nBytes) {
      val b0 = bytes(off) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if (b0 < 0xe0) {
        cp = ((b0 & 0x1f) << 6) | (bytes(off + 1) & 0x3f); len = 2
      } else if (b0 < 0xf0) {
        cp = ((b0 & 0x0f) << 12) | ((bytes(off + 1) & 0x3f) << 6) |
          (bytes(off + 2) & 0x3f); len = 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((bytes(off + 1) & 0x3f) << 12) |
          ((bytes(off + 2) & 0x3f) << 6) | (bytes(off + 3) & 0x3f); len = 4
      }
      val seg = ((segs * ci + segs - 1) / n).toInt
      p(seg) += cp
      ci += 1
      off += len
    }
    var tot = 0L
    var i = 0
    while (i < segs) { tot += p(i); i += 1 }
    val mean = tot.toDouble / segs.toDouble
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var code = 0L
      var j = 0
      while (j < bandBits) {
        if (p(b * bandBits + j).toDouble > mean) code |= 1L << j
        j += 1
      }
      out(b) = code
      b += 1
    }
    out
  }
}

object PhashExpressions {
  /** Column wrapper for [[PhashBandCodes]]. */
  def phashBandCodes(text: Column, segs: Int, bands: Int): Column =
    ColumnBridge.column(PhashBandCodes(
      ColumnBridge.expression(text), segs, bands))
}
