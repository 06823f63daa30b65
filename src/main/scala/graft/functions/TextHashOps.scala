package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native (codegen'd) text-shingling and MinHash signatures.
  *
  * The builtin route for word n-gram shingles —
  * `array_distinct(transform(sequence(...), i -> concat_ws(...)))` — walks
  * interpreted lambda closures per element (higher-order functions do not
  * participate in whole-stage codegen), which made shingle materialization
  * the single hottest stage of every dedup query (~4 s of a 7 s pipeline
  * at sf0.1). Likewise the 128-way `min((h*a+b)%p)` aggregate reduction
  * pays hash-aggregate buffer traffic per posting row. Both are
  * one-pass-per-document primitive loops at heart; these expressions
  * compile them into whole-stage codegen the same way
  * [[ArrayDotProduct]] does for vector math.
  *
  * Determinism contract (matches the previous builtin formulation exactly):
  *  - words = `split(text, " ")` semantics (trailing empties kept);
  *  - shingles = `n`-word windows joined by one space, distinct in first-
  *    occurrence order (`array_distinct` semantics);
  *  - shingle hash = `pmod(xxhash64(s), HashMod)` — the same XXH64 seed-42
  *    bytes hash Spark's builtin computes;
  *  - minhash_j = min over shingles of `(h * a_j + b_j) % Prime`.
  */
object TextHashOps {

  /** Idempotently register graft text/hash functions on the session. */
  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", WordShingles.build, "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinHashSignature(exprs.head), "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bandkeys", exprs => MinHashBandKeys(exprs.head), "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", exprs => SimHash64(exprs.head), "built-in")
  }

  /** Distinct word-3-gram shingles of a text column (array<string>). */
  def shinglesNative(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("graft_shingles", text)
  }

  /** Distinct word-`n`-gram shingles — the contamination-check length
    * (eval-overlap screens use long n-grams, e.g. 8) differs from the
    * near-dup length (3).
    */
  def shinglesNative(spark: SparkSession, text: Column, n: Int): Column = {
    register(spark)
    call_function("graft_shingles", text, lit(n))
  }

  /** 128-long MinHash signature of a shingle-array column (array<long>). */
  def minhashNative(spark: SparkSession, shingles: Column): Column = {
    register(spark)
    call_function("graft_minhash", shingles)
  }

  /** 32 LSH band keys of a 128-long signature column (array<long>). */
  def bandKeysNative(spark: SparkSession, sig: Column): Column = {
    register(spark)
    call_function("graft_bandkeys", sig)
  }

  /** 64-bit SimHash of a text column (long). */
  def simhashNative(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("graft_simhash", text)
  }
}

/** Distinct word-`n`-gram shingles, first-occurrence order. Fewer than `n`
  * words → empty array (callers filter on `size >= 1`, the twin of the old
  * `size(split(text,' ')) >= n` guard). Null text → null.
  */
case class WordShingles(child: Expression, n: Int = 3) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val arr = WordShingles.shingle(input.asInstanceOf[UTF8String], n)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.functions.WordShingles.shingle($c, $n))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** Registry builder: `graft_shingles(text[, n])` — `n` must be a
    * positive integer literal (it is baked into generated code). Null,
    * non-integral, and non-positive literals are rejected with the same
    * curated error rather than leaking an NPE/ClassCastException from
    * evaluation.
    */
  def build(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(t) => WordShingles(t)
    case Seq(t, n) if n.foldable =>
      val v = n.eval() match {
        case i: Int => i.toLong
        case l: Long => l
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case other => throw new IllegalArgumentException(
          s"graft_shingles expects a positive integer literal n, got " +
            (if (other == null) "NULL" else s"$other (${other.getClass.getSimpleName})"))
      }
      require(v >= 1 && v <= 1000,
        s"graft_shingles n must be in [1, 1000], got $v")
      WordShingles(t, v.toInt)
    case _ => throw new IllegalArgumentException(
      "graft_shingles expects (text) or (text, <positive integer literal n>)")
  }

  /** One pass: split on single spaces (trailing empties kept, like
    * `split(text, " ")`), emit distinct n-word windows joined by " ".
    * Static so generated code can call it — the loop is plain JVM code
    * either way; codegen only removes per-row virtual dispatch.
    */
  def shingle(text: UTF8String, n: Int): Array[UTF8String] = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[UTF8String](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    out
  }
}

/** 128-long MinHash signature over an array<string> of shingles.
  * Empty array → null (docs without shingles never reach this — shingled()
  * filters them — but null is the safe contract).
  */
case class MinHashSignature(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.sign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.MinHashSignature.sign($c);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** LSH band keys over a minhash signature: key_b = the multi-argument
  * builtin `xxhash64(m_{4b}, m_{4b+1}, m_{4b+2}, m_{4b+3})` (seed 42,
  * XXH64.hashLong chaining — bit-identical to the builtin, pinned by
  * spec). One tiny loop instead of `Bands` structs × `RowsPerBand`
  * element_at's of inline codegen, which dominated candidate-generation
  * compile+eval time when expanded on both sides of the self-join.
  */
case class MinHashBandKeys(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bandkeys"

  override def nullSafeEval(input: Any): Any =
    MinHashBandKeys.keys(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashBandKeys.keys($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBandKeys {
  val Bands = 32
  val RowsPerBand: Int = MinHashSignature.NumHashes / Bands

  def keys(sig: ArrayData): ArrayData = {
    val out = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      var h = 42L
      var r = 0
      while (r < RowsPerBand) {
        h = XXH64.hashLong(sig.getLong(b * RowsPerBand + r), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** 64-bit SimHash over whitespace tokens: per token-hash bit b, sum ±1
  * over ALL token occurrences (not distinct — weight by frequency, the
  * classic Charikar form); bit set iff the sum is positive. Token hash is
  * the builtin `xxhash64` (seed 42) over the token bytes, so the value is
  * bit-identical to the former explode + 64-`sum` aggregate formulation
  * (pinned by spec) — but computed in one map-side pass per document
  * instead of a token shuffle into 64 aggregate buffers.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHash64.sign(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.sign($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  private val Space = UTF8String.fromString(" ")

  def sign(text: UTF8String): Long = {
    val tokens = text.split(Space, -1)
    val sums = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

object MinHashSignature {
  val NumHashes = 128
  /** Shingle-hash domain (fits 30 bits → a*h fits a long). */
  val HashMod = 1000000007L
  /** Minhash modulus (prime < 2^31). */
  val Prime = 2038074743L
  /** splitmix64 finalizer — public-domain constants (Steele et al.). */
  private def mix(x: Long): Long = {
    var z = (x + 1) * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Affine coefficients derived by scrambling j through splitmix64.
    *
    * The original family — `a_j = (j+1)·2654435761 mod P` — is LINEAR in
    * j, so the 4 permutations inside an LSH band are affinely related and
    * min-wise independence collapses: at a 500k-doc corpus the band
    * self-join produced 19M false-positive candidates (J ≈ 0.02 pairs
    * colliding at ~1.5e-4 instead of J⁴ ≈ 1e-7), 135 s of verify work
    * for 5k real pairs. Scrambled coefficients restore the expected
    * collision rate; the exact verify step means final pair sets are
    * identical either way — this is purely the candidate-volume
    * scale fix.
    */
  val CoefA: Array[Long] = Array.tabulate(NumHashes)(j =>
    java.lang.Math.floorMod(mix(j), Prime - 1) + 1) // nonzero
  val CoefB: Array[Long] = Array.tabulate(NumHashes)(j =>
    java.lang.Math.floorMod(mix(j + 100003), Prime))

  /** Tight two-level loop: per shingle, one XXH64 (seed 42 — identical to
    * the builtin `xxhash64`) reduced into [0, HashMod), then 128 affine
    * min updates on a primitive long[]. Returns null for an empty array.
    */
  def sign(shingles: ArrayData): ArrayData = {
    val m = shingles.numElements()
    if (m == 0) return null
    val mins = new Array[Long](NumHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < m) {
      val s = shingles.getUTF8String(i)
      val h = java.lang.Math.floorMod(
        XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L),
        HashMod)
      var j = 0
      while (j < NumHashes) {
        // h ≥ 0 and CoefA/CoefB < Prime < 2^31 ⇒ dividend in [0, 2^61):
        // plain % equals pmod and nothing overflows
        val v = (h * CoefA(j) + CoefB(j)) % Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
