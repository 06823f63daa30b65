package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rank-ordered BPE merge table, pre-indexed for the encode kernel.
  *
  * `ranksOf` maps an adjacent symbol pair (keyed `lhs + '\u0000' + rhs` —
  * symbols are `[a-z]+`, so the separator can never collide) to the SORTED
  * array of 1-based ranks that merge it. A pair normally has exactly one
  * rank, but a re-learned pair (its occurrences recreated by an
  * intermediate merge and counted again later in training) is legal, and
  * the chained-pass semantics apply each of its ranks independently — the
  * per-pair rank ARRAY keeps that case exact.
  *
  * The table is symbol-DOMAIN agnostic: char-level symbols (`[a-z]+`) and
  * byte-level symbols (lowercase hex, `[0-9a-f]+` with even length) both
  * exclude the NUL separator, so the same index serves both kernels.
  */
final class BpeMergeTable(val lhs: Array[String], val rhs: Array[String])
    extends Serializable {
  require(lhs.length == rhs.length, "ragged merge table")

  @transient lazy val ranksOf: java.util.HashMap[String, Array[Int]] = {
    val grouped = new java.util.HashMap[String, java.util.ArrayList[Int]]()
    var i = 0
    while (i < lhs.length) {
      val k = lhs(i) + "\u0000" + rhs(i)
      var l = grouped.get(k)
      if (l == null) { l = new java.util.ArrayList[Int](); grouped.put(k, l) }
      l.add(i + 1) // insertion order is rank order → already sorted
      i += 1
    }
    val out = new java.util.HashMap[String, Array[Int]](grouped.size() * 2)
    grouped.forEach { (k, l) =>
      val a = new Array[Int](l.size()); var j = 0
      while (j < a.length) { a(j) = l.get(j); j += 1 }
      out.put(k, a)
    }
    out
  }
}

/** BPE-encode a word against a frozen merge table, as ONE codegen'd kernel
  * instead of `numMerges` chained literal `replace`es in the projection —
  * the spelling that breaks down past the 64-merge fixture scale (a 32k-
  * merge production vocabulary would be 32k sequential string passes per
  * row and a 32k-node plan).
  *
  * Semantics are EXACTLY the chained form's (spec-pinned in `BpeSpec`,
  * and the `tokenize_bpe*` DuckDB oracles replay the chained passes):
  * for r = 1..numMerges in order, apply merge r as one greedy leftmost
  * non-overlapping pass over the symbol sequence. The kernel skips the
  * no-op passes: it repeatedly finds the smallest rank STRICTLY ABOVE the
  * last applied one whose pair occurs in the current sequence and applies
  * that single pass — between two applied ranks the sequence is unchanged,
  * so every skipped rank's pass was a no-op, and a pass can never recreate
  * its own pair (the merged symbol differs from both sides), so one pass
  * per applied rank is exact. Cost is O(|word|) scans per APPLIED merge
  * (≤ |word| − 1 of them) — independent of the table size, vs the chained
  * form's `numMerges` passes whether or not they fire.
  *
  * Output: the post-merge symbol array (what `bpeSymbols` extracts from
  * the chained form's symseq string).
  *
  * `byteLevel = true` switches the INITIAL symbol inventory from the
  * word's characters to its UTF-8 bytes, each spelled as a lowercase
  * 2-hex-digit symbol (`é` → `c3`,`a9`) — the production-tokenizer domain
  * (initial inventory 256, no OOV possible for any input). The merge loop
  * itself is domain-blind.
  */
case class BpeEncodeWord(child: Expression, table: BpeMergeTable,
                         byteLevel: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override def nullSafeEval(a: Any): Any =
    BpeEncodeWord.run(a.asInstanceOf[UTF8String], table, byteLevel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeTable", table,
      "graft.functions.BpeMergeTable")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.BpeEncodeWord.run($a, $tRef, $byteLevel);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncodeWord {
  private val HexDigits = "0123456789abcdef".toCharArray

  /** Initial symbol array: one lowercase-hex symbol per UTF-8 byte. */
  private def byteSyms(word: UTF8String): Array[String] = {
    val bytes = word.getBytes
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i) = new String(Array(HexDigits(b >>> 4), HexDigits(b & 0xf)))
      i += 1
    }
    out
  }

  def run(word: UTF8String, t: BpeMergeTable, byteLevel: Boolean): ArrayData = {
    var len = 0
    var syms: Array[String] = null
    if (byteLevel) {
      val bs = byteSyms(word)
      len = bs.length
      syms = if (len > 0) bs else new Array[String](1)
    } else {
      val w = word.toString
      len = w.length
      syms = new Array[String](math.max(len, 1))
      var k = 0
      while (k < len) { syms(k) = String.valueOf(w.charAt(k)); k += 1 }
    }
    var i = 0
    val ranks = t.ranksOf
    var last = 0
    var progress = len > 1
    while (progress) {
      // smallest applicable rank > last across current adjacent pairs
      var bestRank = Int.MaxValue
      i = 0
      while (i < len - 1) {
        val rs = ranks.get(syms(i) + "\u0000" + syms(i + 1))
        if (rs != null) {
          // first rank strictly above `last` (rank arrays are tiny; linear)
          var j = 0
          while (j < rs.length && rs(j) <= last) j += 1
          if (j < rs.length && rs(j) < bestRank) bestRank = rs(j)
        }
        i += 1
      }
      if (bestRank == Int.MaxValue) progress = false
      else {
        // one greedy leftmost non-overlapping pass of merge `bestRank`
        val l = t.lhs(bestRank - 1); val r = t.rhs(bestRank - 1)
        val merged = l.concat(r)
        var src = 0; var dst = 0
        while (src < len) {
          if (src + 1 < len && syms(src) == l && syms(src + 1) == r) {
            syms(dst) = merged; src += 2
          } else { syms(dst) = syms(src); src += 1 }
          dst += 1
        }
        len = dst
        last = bestRank
        progress = len > 1
      }
    }
    val out = new Array[AnyRef](len)
    i = 0
    while (i < len) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(out)
  }
}

object BpeOps {

  /** Idempotently register the BPE kernel on the session's registry. */
  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_encode", exprs => {
        // merge table arrives as two foldable literal arrays (rank order)
        val l = exprs(1).eval() match {
          case ad: ArrayData => ad.toObjectArray(StringType)
            .map(_.asInstanceOf[UTF8String].toString)
        }
        val r = exprs(2).eval() match {
          case ad: ArrayData => ad.toObjectArray(StringType)
            .map(_.asInstanceOf[UTF8String].toString)
        }
        val byteLevel =
          exprs.length > 3 && exprs(3).eval().asInstanceOf[Boolean]
        BpeEncodeWord(exprs.head, new BpeMergeTable(l, r), byteLevel)
      }, "built-in")
  }

  /** Post-merge symbol array of a word column under the frozen
    * rank-ordered merge list — the codegen'd twin of the chained
    * `replace` spelling (`TextAnalysis.bpeChainedSyms`, the parity pin).
    * `byteLevel = true` starts from lowercase-hex UTF-8 byte symbols
    * (merge table symbols must then be in the same hex domain).
    */
  def encodeNative(spark: SparkSession, word: Column,
                   merges: Seq[(String, String)],
                   byteLevel: Boolean = false): Column = {
    register(spark)
    call_function("graft_bpe_encode", word,
      org.apache.spark.sql.functions.typedlit(merges.map(_._1)),
      org.apache.spark.sql.functions.typedlit(merges.map(_._2)),
      org.apache.spark.sql.functions.lit(byteLevel))
  }
}
